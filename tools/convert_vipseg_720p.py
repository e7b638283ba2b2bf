"""Resize VIPSeg images + panoptic masks to 720p, and generate the
annotations-empty test-split json.

Re-designs the reference's VIPSeg conversion utilities
(``DVIS_Plus/datasets/utils/vipseg_change2_720p.py``: shortest side to 720,
images bilinear, id masks nearest; ``DVIS_Plus/utils/gen_VIPSeg_test_json.py``:
per-video image infos + empty ``segments_info`` rows for the eval server).

  python tools/convert_vipseg_720p.py --src VIPSeg/raw --dst VIPSeg/VIPSeg_720P
  python tools/convert_vipseg_720p.py --gen-test-json VIPSeg/VIPSeg_720P
"""
import argparse
import json
import os


def resize_tree(src: str, dst: str) -> None:
    import cv2

    for sub, interp in (("images", cv2.INTER_LINEAR), ("panomasksRGB", cv2.INTER_NEAREST)):
        src_root = os.path.join(src, sub)
        for video in sorted(os.listdir(src_root)):
            out_dir = os.path.join(dst, sub, video)
            os.makedirs(out_dir, exist_ok=True)
            for name in sorted(os.listdir(os.path.join(src_root, video))):
                img = cv2.imread(os.path.join(src_root, video, name), cv2.IMREAD_COLOR)
                h, w = img.shape[:2]
                s = 720 / min(h, w)
                img = cv2.resize(img, (int(w * s + 0.5), int(h * s + 0.5)), interpolation=interp)
                cv2.imwrite(os.path.join(out_dir, name), img)
            print(video)


def gen_test_json(base: str, split: str = "test") -> str:
    """Annotations-empty json for the test split (reference
    gen_VIPSeg_test_json.py): per-video image infos + empty segments_info
    rows; categories copied from the val GT json when present."""
    import cv2

    image_root = os.path.join(base, "images")
    with open(os.path.join(base, f"{split}.txt"), encoding="gbk") as f:
        video_ids = [ln.strip() for ln in f if ln.strip()]

    videos, annotations = [], []
    for vid in video_ids:
        frames = sorted(os.listdir(os.path.join(image_root, vid)))
        images, rows = [], []
        for name in frames:
            h, w = cv2.imread(os.path.join(image_root, vid, name)).shape[:2]
            stem = os.path.splitext(name)[0]
            images.append({"id": stem, "width": w, "height": h, "file_name": name})
            rows.append({"image_id": stem, "file_name": name, "segments_info": []})
        videos.append({"video_id": vid, "images": images})
        annotations.append({"video_id": vid, "annotations": rows})

    categories = []
    val_json = os.path.join(base, "panoptic_gt_VIPSeg_val.json")
    if os.path.exists(val_json):
        with open(val_json) as f:
            categories = json.load(f).get("categories", [])

    out = os.path.join(base, f"panoptic_gt_VIPSeg_{split}.json")
    with open(out, "w") as f:
        json.dump(
            {"videos": videos, "annotations": annotations, "categories": categories}, f
        )
    print(f"wrote {out} ({len(videos)} videos)")
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src")
    parser.add_argument("--dst")
    parser.add_argument("--gen-test-json", metavar="BASE",
                        help="generate the annotations-empty test json under BASE")
    parser.add_argument("--split", default="test")
    args = parser.parse_args()

    if args.gen_test_json:
        gen_test_json(args.gen_test_json, args.split)
    if args.src and args.dst:
        resize_tree(args.src, args.dst)


if __name__ == "__main__":
    main()
