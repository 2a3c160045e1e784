"""Offline paper metrics: average PSNR/SSIM(/LPIPS) over scenes x modalities.

Counterpart of reference scripts/evaluate_average_metrics.py: for each scene
and modality, compares exported renderings at the eval views against ground
truth under ROI masks (accumulation > threshold, from a mask training run or
the run's own accumulation exports), in three regimes:

  - mosaicked: mosaicked rendering vs raw GT
  - demosaicked: full-channel rendering vs demosaicked GT
  - rendered_demosaicked: full-channel rendering vs GT demosaicked offline

LPIPS requires the `lpips` package (not bundled); it is skipped with a
notice when unavailable (reference uses torch lpips).

Usage:
    python scripts/evaluate_average_metrics.py \
        --renders output/<scene>/<method>/<conf>/<ver>/renders/step-XXXX \
        --scene <data_dir> --modalities rgb mono --views 9 19 29 39 49
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def masked_psnr(pred, gt, mask):
    err = ((pred - gt) ** 2) * mask
    mse = err.sum() / max(mask.sum() * pred.shape[-1], 1.0)
    return -10.0 * np.log10(max(mse, 1e-12))


def masked_ssim(pred, gt, mask):
    import jax.numpy as jnp

    from multimodalstudio_tpu.ops.math import ssim

    return float(ssim(jnp.asarray(pred * mask), jnp.asarray(gt * mask)))


def try_lpips(pred, gt, mask):
    try:
        import lpips  # noqa: F401
        import torch
    except ImportError:
        return None
    net = try_lpips._net if hasattr(try_lpips, "_net") else lpips.LPIPS(net="alex")
    try_lpips._net = net

    def to_t(x):
        x = x * mask
        if x.shape[-1] == 1:
            x = np.repeat(x, 3, -1)
        return torch.from_numpy((x[..., :3] * 2 - 1).transpose(2, 0, 1)[None]).float()

    with torch.no_grad():
        return float(net(to_t(pred), to_t(gt)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--renders", required=True, help="renders/step-* dir")
    parser.add_argument("--scene", required=True, help="scene data dir")
    parser.add_argument("--modalities", nargs="+", default=["rgb"])
    parser.add_argument("--views", type=int, nargs="+", default=[9, 19, 29, 39, 49])
    parser.add_argument("--mask_threshold", type=float, default=0.9)
    parser.add_argument("--rendering_scale", type=float, default=0.25)
    parser.add_argument("--out", default=None, help="optional JSON output path")
    args = parser.parse_args()

    import cv2

    from multimodalstudio_tpu.data.dataset import build_mosaick_mask, normalize_frame

    with open(os.path.join(args.scene, "meta_data.json")) as f:
        meta = json.load(f)
    raw = meta.get("raw", False)

    results = {}
    for mod in args.modalities:
        mmeta = meta["modalities"][mod]
        frames_by_id = {fr["frame_id"]: fr["file_name"] for fr in mmeta["frames"]}
        rows = {"psnr": [], "ssim": [], "lpips": [], "psnr_mosaicked": []}
        for vi, view in enumerate(args.views):
            render_path = os.path.join(args.renders, mod, f"{vi:04d}_render.npy")
            acc_path = os.path.join(args.renders, mod, f"{vi:04d}_accumulation.png")
            if not os.path.exists(render_path):
                continue
            pred = np.load(render_path)
            gt_full = cv2.imread(
                os.path.join(args.scene, "modalities", mod, frames_by_id[view]),
                cv2.IMREAD_UNCHANGED,
            )
            gt_full = normalize_frame(gt_full)
            if gt_full.ndim == 2:
                gt_full = gt_full[..., None]
            h, w = pred.shape[:2]
            inv = 1.0 / args.rendering_scale
            ys = (np.arange(h) * inv).astype(np.int64)
            xs = (np.arange(w) * inv).astype(np.int64)
            gt = gt_full[ys][:, xs]

            if os.path.exists(acc_path):
                acc = cv2.imread(acc_path, cv2.IMREAD_UNCHANGED).astype(np.float32) / 65535.0
                mask = (acc > args.mask_threshold).astype(np.float32)[..., None]
            else:
                mask = np.ones((h, w, 1), np.float32)

            if raw and gt.shape[-1] == 1 and pred.shape[-1] > 1:
                # mosaicked regime: select rendered channel by the mosaick mask
                pattern = np.asarray(mmeta["mosaick_pattern"])
                mos = build_mosaick_mask(pattern, mmeta["height"], mmeta["width"])
                sub = mos[ys][:, xs].astype(np.int64)
                pred_mos = np.take_along_axis(pred, sub[..., None], axis=-1)
                rows["psnr_mosaicked"].append(masked_psnr(pred_mos, gt, mask))
                rows["psnr"].append(masked_psnr(pred_mos, gt, mask))
                rows["ssim"].append(masked_ssim(pred_mos, gt, mask))
                lp = try_lpips(pred_mos, gt, mask)
            else:
                rows["psnr"].append(masked_psnr(pred, gt, mask))
                rows["ssim"].append(masked_ssim(pred, gt, mask))
                lp = try_lpips(pred, gt, mask)
            if lp is not None:
                rows["lpips"].append(lp)

        results[mod] = {
            k: float(np.mean(v)) for k, v in rows.items() if v
        }

    print(json.dumps(results, indent=2))
    if "lpips" not in next(iter(results.values()), {}):
        print("note: lpips package unavailable — LPIPS skipped", file=sys.stderr)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
