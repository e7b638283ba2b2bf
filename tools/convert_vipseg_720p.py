"""Resize VIPSeg images + panoptic masks to 720p.

Re-designs the reference's VIPSeg->720p conversion utility
(``DVIS_Plus/datasets/utils``): shortest side to 720, images bilinear, id
masks nearest.

  python tools/convert_vipseg_720p.py --src VIPSeg/raw --dst VIPSeg/VIPSeg_720P
"""
import argparse
import os


def main():
    import cv2

    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True)
    parser.add_argument("--dst", required=True)
    args = parser.parse_args()

    for sub, interp in (("images", cv2.INTER_LINEAR), ("panomasksRGB", cv2.INTER_NEAREST)):
        src_root = os.path.join(args.src, sub)
        for video in sorted(os.listdir(src_root)):
            out_dir = os.path.join(args.dst, sub, video)
            os.makedirs(out_dir, exist_ok=True)
            for name in sorted(os.listdir(os.path.join(src_root, video))):
                img = cv2.imread(os.path.join(src_root, video, name), cv2.IMREAD_COLOR)
                h, w = img.shape[:2]
                s = 720 / min(h, w)
                img = cv2.resize(img, (int(w * s + 0.5), int(h * s + 0.5)), interpolation=interp)
                cv2.imwrite(os.path.join(out_dir, name), img)
            print(video)


if __name__ == "__main__":
    main()
