"""Train a small DDPM on synthetic images and prove the LEARNED
inpainting path end-to-end — no reference checkpoint needed.

The reference's texture quality rides on the downloaded
256x256_diffusion_uncond.pt (guided_diffusion/diffusion.py:435-457) that
cannot be fetched offline.  This closes the gap the same way
train_poco_synthetic does for geometry: train the same UNet architecture
(reduced widths) with the DDPM objective on an analytic image family
(models/diffusion/synthetic_images.py), then inpaint held-out masked
images with the REAL DDNM sampler (ddnm_inpaint_batch) and score
masked-region PSNR against the non-learned fills the pipeline falls back
to (jump-flood nearest, pull-push linear — pipeline/inpaint.py).

  python -m pointdreamer_tpu.cli.train_ddnm_synthetic \\
      --ckpt /tmp/ddnm_synth.pkl --epochs 30 --steps 200

Prints one table; exits nonzero if DDNM inpainting with the trained
model does not beat both non-learned fills on mean unknown-region PSNR.
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/ddnm_synth.pkl")
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--eval-images", type=int, default=16)
    ap.add_argument("--t-sampling", type=int, default=100)
    ap.add_argument("--known-frac", type=float, default=0.35,
                    help="fraction of pixels kept in the masked inputs")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--quant-fidelity", action="store_true",
                    help="also run the w8a8 samplers over the TRAINED "
                         "weights and record their PSNR vs the fp "
                         "sampler (the trained-weights data point of the "
                         "int8 fidelity story — docs/w8a8_flagship_"
                         "fidelity_r05.json carries the 552M one)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..core.log import get_logger
    from ..core.runtime import setup_jax
    from ..models.diffusion import UNetModel, init_unet_params
    from ..models.diffusion.ddnm import ddnm_inpaint_batch
    from ..models.diffusion.synthetic_images import sample_images
    from ..models.diffusion.train import (fit_ddpm, load_ddpm_checkpoint)
    from ..pipeline.inpaint import inpaint_linear, inpaint_nearest

    setup_jax()
    log = get_logger()

    model = UNetModel(model_channels=args.channels, out_channels=3,
                      num_res_blocks=1, channel_mult=(1, 2, 2),
                      attention_ds=(4,), num_head_channels=16,
                      dtype=jnp.float32)
    if args.skip_train:
        params = jax.tree_util.tree_map(jnp.asarray,
                                        load_ddpm_checkpoint(args.ckpt))
    else:
        params = init_unet_params(model, image_size=args.res)
        params, hist = fit_ddpm(
            model, params, epochs=args.epochs,
            steps_per_epoch=args.steps, batch=args.batch, res=args.res,
            lr=args.lr, checkpoint_path=args.ckpt, logger=log)
        log.info(f"final loss: {hist[-1]['loss']:.5f}")

    # held-out images (a key stream training never draws: fold_in)
    key = jax.random.fold_in(jax.random.PRNGKey(0), 999)
    k_img, k_mask, k_ddnm = jax.random.split(key, 3)
    imgs = sample_images(k_img, args.eval_images, args.res)
    # scattered known pixels (iid at known_frac): the pipeline's actual
    # inpainting regime — sparse images are point splats scattered over
    # the whole view (get_one_sparse_img, ours_utils.py:954-1044), not
    # contiguous holes, and it is the regime where reconstruction
    # fidelity (PSNR vs the true image) is the right score for a
    # generative fill
    masks = (jax.random.uniform(k_mask, (args.eval_images, args.res,
                                         args.res))
             < args.known_frac).astype(jnp.float32)
    masked = imgs * masks[..., None]

    results = {}

    def psnr_unknown(pred):
        unk = np.asarray(1.0 - masks)[..., None]
        d2 = (np.asarray(pred) - np.asarray(imgs)) ** 2 * unk
        mse = d2.sum() / (unk.sum() * 3.0)
        return float(10 * np.log10(1.0 / max(mse, 1e-12)))

    out = ddnm_inpaint_batch(model, params, masked, masks, k_ddnm,
                             t_sampling=args.t_sampling)
    results["DDNM(self-trained)"] = psnr_unknown(out)
    results["nearest(jump-flood)"] = psnr_unknown(
        inpaint_nearest(masked, masks))
    results["linear(pull-push)"] = psnr_unknown(
        inpaint_linear(masked, masks))
    if args.quant_fidelity:
        from ..models.diffusion import DDNMInpainter
        from ..models.diffusion.unet import quantize_unet_params

        qmodel = model.clone(quant=True)
        qparams = quantize_unet_params(params)
        out_dyn = ddnm_inpaint_batch(qmodel, qparams, masked, masks,
                                     k_ddnm, t_sampling=args.t_sampling)
        stat = DDNMInpainter(qmodel, qparams,
                             t_sampling=args.t_sampling,
                             static_calib=True)
        out_stat = stat.inpaint(masked, masks, k_ddnm)

        def psnr_full(a, b):
            mse = float(np.mean((np.asarray(a, np.float64)
                                 - np.asarray(b, np.float64)) ** 2))
            return float(10 * np.log10(1.0 / max(mse, 1e-12)))

        results["int8-dynamic PSNR vs fp sampler"] = psnr_full(out_dyn,
                                                               out)
        results["int8-static PSNR vs fp sampler"] = psnr_full(out_stat,
                                                              out)
        results["DDNM(int8-dynamic)"] = psnr_unknown(out_dyn)
        results["DDNM(int8-static)"] = psnr_unknown(out_stat)

    for k, v in results.items():
        log.info(f"{k}: unknown-region PSNR {v:.2f} dB")
    print(json.dumps({k: round(v, 3) for k, v in results.items()},
                     indent=1))

    best_nl = max(results["nearest(jump-flood)"],
                  results["linear(pull-push)"])
    if results["DDNM(self-trained)"] <= best_nl:
        log.warning("learned inpainting did NOT beat the non-learned fills")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
