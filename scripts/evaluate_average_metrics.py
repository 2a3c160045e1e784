"""Offline paper metrics: average PSNR/SSIM(/LPIPS) over scenes x modalities.

Counterpart of reference scripts/evaluate_average_metrics.py:150-331: for
each scene and modality, compares exported renderings at the eval views
against ground truth under ROI masks (accumulation > threshold), in THREE
regimes, each with its own psnr/ssim/lpips:

  raw training (gt frames are mosaicked single-channel):
    - mosaicked:             mosaicked rendering vs raw GT
    - demosaicked:           demosaick(mosaicked rendering) vs demosaick(GT)
    - rendered_demosaicked:  the model's native full-channel rendering vs
                             demosaick(GT)
  demosaicked training (gt frames are full-channel):
    - rendered_demosaicked:  rendering vs GT (identity regime)
    - mosaicked:             mosaick both through the pattern
    - demosaicked:           demosaick(mosaicked) for both

Demosaicking follows the reference's per-modality protocol
(evaluate_average_metrics.py:61-66): edge-aware OpenCV Bayer for rgb,
edge-aware PFA interpolation for polarization (the polanalyser
COLOR_PolarMono_EA construction), RegularGridInterpolator-style grid
interpolation for multispectral. Channel ordering follows the scene's
mosaick pattern, matching the model's channel indexing.

LPIPS is computed with the in-repo JAX implementation
(multimodalstudio_tpu/utils/lpips_jax.py — AlexNet-LPIPS per the reference
protocol). With vendored trained weights (scripts/vendor_lpips_weights.py)
it is the paper-faithful metric; otherwise a documented deterministic
rand-init fallback produces comparable-within-a-table scores, and the
weight source is printed with the results.

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

# Honor JAX_PLATFORMS in-process: the axon sitecustomize pins the platform
# and ignores the env var, so `JAX_PLATFORMS=cpu` subprocess runs (tests,
# metric sweeps on hosts without the TPU tunnel) would otherwise hang on
# tunnel connect. Metric math is tiny — CPU is the right default there.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def masked_psnr(pred, gt, mask):
    err = ((pred - gt) ** 2) * mask
    mse = err.sum() / max(mask.sum() * pred.shape[-1], 1.0)
    return -10.0 * np.log10(max(mse, 1e-12))


def masked_ssim(pred, gt, mask):
    # reference protocol: SSIM map over the FULL images, averaged over the
    # mask (evaluate_average_metrics.py:154-168) — not masked-then-SSIM
    import jax.numpy as jnp

    from multimodalstudio_tpu.ops.math import masked_ssim as _masked_ssim

    return float(_masked_ssim(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))


def try_lpips(pred, gt, mask):
    # mask-zeroed inputs in [-1, 1], 3-channel, per the reference protocol
    # (evaluate_average_metrics.py:173-191); >3-channel modalities score the
    # channel mean replicated (reference :241-247).
    from multimodalstudio_tpu.utils.lpips_jax import lpips

    def to_img(x):
        x = x * mask
        if x.shape[-1] == 1:
            x = np.repeat(x, 3, -1)
        elif x.shape[-1] > 3:
            x = np.repeat(x.mean(-1, keepdims=True), 3, -1)
        return x[..., :3] * 2.0 - 1.0

    if min(pred.shape[0], pred.shape[1]) < 32:
        return None  # below the 5-stage AlexNet receptive minimum
    return float(lpips(to_img(pred), to_img(gt))[0])


def regime_metrics(pred, gt, mask, rows, regime):
    rows[f"psnr_{regime}"].append(masked_psnr(pred, gt, mask))
    rows[f"ssim_{regime}"].append(masked_ssim(pred, gt, mask))
    lp = try_lpips(pred, gt, mask)
    if lp is not None:
        rows[f"lpips_{regime}"].append(lp)


REGIMES = ("mosaicked", "demosaicked", "rendered_demosaicked")


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
    from multimodalstudio_tpu.preprocessing.demosaick import demosaick_for_modality

    with open(os.path.join(args.scene, "meta_data.json")) as f:
        meta = json.load(f)
    raw = meta.get("raw", False)

    results = {}
    for mod in args.modalities:
        mmeta = meta["modalities"][mod]
        frames_by_id = {fr["frame_id"]: fr["file_name"] for fr in mmeta["frames"]}
        pattern = np.asarray(mmeta.get("mosaick_pattern", [[0]]))
        multi_channel_pattern = int(pattern.max()) > 0
        rows = {f"{m}_{r}": [] for r in REGIMES for m in ("psnr", "ssim", "lpips")}
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

            # the mosaick mask subsampled to the rendering scale
            mos = build_mosaick_mask(pattern, mmeta["height"], mmeta["width"])
            sub = mos[ys][:, xs].astype(np.int64)

            if raw and gt.shape[-1] == 1 and pred.shape[-1] > 1:
                # gt is a raw mosaicked frame; pred renders all channels
                pred_mos = np.take_along_axis(pred, sub[..., None], axis=-1)
                regime_metrics(pred_mos, gt, mask, rows, "mosaicked")
                if multi_channel_pattern and args.rendering_scale == 1.0:
                    # demosaicking needs the unbroken mosaick periodicity —
                    # full-resolution renders only (the reference's paper
                    # protocol also scores full-res exports)
                    gt_dem = demosaick_for_modality(gt, pattern, mod)
                    pred_dem = demosaick_for_modality(pred_mos, pattern, mod)
                    regime_metrics(pred_dem, gt_dem, mask, rows, "demosaicked")
                    regime_metrics(pred, gt_dem, mask, rows, "rendered_demosaicked")
                else:
                    # single-channel mosaick (mono/infrared): demosaicking is
                    # the identity (reference demosaicking_fns:63-64)
                    regime_metrics(pred_mos, gt, mask, rows, "demosaicked")
                    regime_metrics(pred, gt, mask, rows, "rendered_demosaicked")
            else:
                # demosaicked training: gt and pred are full-channel
                # (reference evaluate_average_metrics.py:283-318)
                if pred.shape[-1] != gt.shape[-1]:
                    pred = pred[..., : gt.shape[-1]]
                regime_metrics(pred, gt, mask, rows, "rendered_demosaicked")
                if multi_channel_pattern:
                    gt_mos = np.take_along_axis(gt, sub[..., None], axis=-1)
                    pred_mos = np.take_along_axis(pred, sub[..., None], axis=-1)
                    regime_metrics(pred_mos, gt_mos, mask, rows, "mosaicked")
                    if args.rendering_scale == 1.0:
                        regime_metrics(
                            demosaick_for_modality(pred_mos, pattern, mod),
                            demosaick_for_modality(gt_mos, pattern, mod),
                            mask, rows, "demosaicked",
                        )
                else:
                    regime_metrics(pred, gt, mask, rows, "mosaicked")
                    regime_metrics(pred, gt, mask, rows, "demosaicked")

        results[mod] = {k: float(np.mean(v)) for k, v in rows.items() if v}
        # headline aliases: psnr = the regime matching the training data
        if raw and f"psnr_mosaicked" in results[mod]:
            results[mod]["psnr"] = results[mod]["psnr_mosaicked"]
            results[mod]["ssim"] = results[mod]["ssim_mosaicked"]
        elif "psnr_rendered_demosaicked" in results[mod]:
            results[mod]["psnr"] = results[mod]["psnr_rendered_demosaicked"]
            results[mod]["ssim"] = results[mod]["ssim_rendered_demosaicked"]

    if any("lpips" in k for r in results.values() for k in r):
        from multimodalstudio_tpu.utils.lpips_jax import weight_source

        results["lpips_weights"] = weight_source()
        if weight_source() == "randinit":
            print(
                "note: LPIPS scored with the deterministic rand-init fallback "
                "(no vendored weights; see scripts/vendor_lpips_weights.py) — "
                "comparable within this table, not to trained-LPIPS values",
                file=sys.stderr,
            )
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
