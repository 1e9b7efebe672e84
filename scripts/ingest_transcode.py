"""Ingest-tier transcode CLI: corpus videos → MJPEG-AVI (natively
decodable by native/videodec.cpp, zero runtime codec deps).

    python scripts/ingest_transcode.py --src /data/mer2023/video \
        --dst /data/mer2023/video_mjpeg [--quality 90]
    python scripts/ingest_transcode.py --src clip.mp4 --dst clip.avi
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from affectgpt_tpu.data.ingest import transcode_tree, transcode_video  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(description="video → MJPEG-AVI ingest transcode")
    parser.add_argument("--src", required=True, help="video file or corpus root")
    parser.add_argument("--dst", required=True, help="output file or root")
    parser.add_argument("--quality", type=int, default=90)
    args = parser.parse_args()
    if os.path.isdir(args.src):
        n = transcode_tree(args.src, args.dst, quality=args.quality)
        print(f"transcoded {n} clips → {args.dst}")
    else:
        n = transcode_video(args.src, args.dst, quality=args.quality)
        print(f"transcoded {n} frames → {args.dst}")


if __name__ == "__main__":
    main()
