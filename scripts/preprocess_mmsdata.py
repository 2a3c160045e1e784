"""Preprocess an MMS-DATA capture (the paper's 32-scene dataset layout).

Counterpart of reference src/preprocessing/preprocess_mmsdata.py: same
pipeline as preprocess_custom_dataset.py but with the MMS-DATA conventions
baked in — the five modalities with their mosaick patterns, per-modality
calibration (camera2reference extrinsic chain), ArUco metric scale from the
36 mm markers, and checkerboard-based reorientation disabled (handled by the
published calibration files).

Usage:
    python scripts/preprocess_mmsdata.py --input <capture_dir> \
        --output scenes/<scene> --calibration <calibration.json> [--undistort]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.preprocess_custom_dataset import main as custom_main

MMS_MODALITIES = ["rgb", "infrared", "mono", "polarization", "multispectral"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--calibration", required=True)
    parser.add_argument("--undistort", action="store_true")
    parser.add_argument("--mosaicked", action="store_true")
    parser.add_argument("--scale", type=float, default=1.0)
    args = parser.parse_args()

    forwarded = [
        "--input", args.input,
        "--output", args.output,
        "--calibration", args.calibration,
        "--modalities", *MMS_MODALITIES,
        "--scale", str(args.scale),
        "--aruco_size", "0.036",
    ]
    if args.undistort:
        forwarded.append("--undistort")
    if args.mosaicked:
        forwarded.append("--mosaicked")
    sys.argv = [sys.argv[0]] + forwarded
    custom_main()


if __name__ == "__main__":
    main()
