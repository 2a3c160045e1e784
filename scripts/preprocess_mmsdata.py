"""Preprocess an MMS-DATA capture (the paper's 32-scene dataset layout).

Counterpart of reference src/preprocessing/preprocess_mmsdata.py: the same
pipeline as preprocess_custom_dataset.py with the MMS-DATA conventions baked
in — the five modalities with the published capture-rig mosaick patterns
(reference preprocess_mmsdata.py:43-47, wavelength-sorted SILIOS bands per
utils.py:248-253), per-modality calibration (camera2reference extrinsic
chain), ArUco metric scale from the 36 mm markers, and checkerboard-based
axis reorientation (utils.py:117-136).

Usage:
    python scripts/preprocess_mmsdata.py --input <capture_dir> \
        --output scenes/<scene> --calibration <calibration.json> [--undistort]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.preprocess_custom_dataset import main as custom_main

MMS_MODALITIES = ["rgb", "infrared", "mono", "polarization", "multispectral"]

# Published MMS-DATA capture-rig patterns (reference
# preprocess_mmsdata.py:43-47). The multispectral pattern maps each 3x3
# mosaic position to its WAVELENGTH-SORTED band index — the inverse of the
# SILIOS re-sort [5,4,3,6,0,1,2,8,7] applied after demosaicking.
MMS_MOSAICK_PATTERNS = {
    "rgb": [[1, 2], [0, 1]],
    "polarization": [[2, 1], [3, 0]],
    "multispectral": [[4, 5, 6], [2, 1, 0], [3, 8, 7]],
    "infrared": [[0]],
    "mono": [[0]],
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--calibration", required=True)
    parser.add_argument("--undistort", action="store_true")
    parser.add_argument("--mosaicked", action="store_true")
    parser.add_argument("--scale", type=float, default=1.0)
    args = parser.parse_args()

    with tempfile.NamedTemporaryFile(
        "w", suffix=".json", delete=False
    ) as pat_file:
        json.dump(MMS_MOSAICK_PATTERNS, pat_file)
        pat_path = pat_file.name

    forwarded = [
        "--input", args.input,
        "--output", args.output,
        "--calibration", args.calibration,
        "--modalities", *MMS_MODALITIES,
        "--scale", str(args.scale),
        "--aruco_size", "0.036",
        "--reorient_axis",
        "--mosaick_patterns_json", pat_path,
    ]
    if args.undistort:
        forwarded.append("--undistort")
    if args.mosaicked:
        forwarded.append("--mosaicked")
    sys.argv = [sys.argv[0]] + forwarded
    try:
        custom_main()
    finally:
        os.unlink(pat_path)


if __name__ == "__main__":
    main()
