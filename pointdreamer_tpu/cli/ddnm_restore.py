"""Standalone DDNM image-restoration CLI.

Reference: models/DDNM's main CLI paths (guided_diffusion/diffusion.py
:115-433 + functions/svd_ddnm.py) — apply a degradation operator to an
image and restore it with DDNM/DDNM+ over the guided-diffusion UNet.

    python -m pointdreamer_tpu.cli.ddnm_restore --image in.png \
        --deg inpainting|sr2|sr4|colorization|deblur|deblur_aniso| \
              sr_conv2|sr_conv4|cs_wh|denoising \
        --checkpoint 256x256_diffusion_uncond.pt --out out.png \
        [--sigma_y 0.0] [--steps 100]
"""
import argparse


def main():
    ap = argparse.ArgumentParser("ddnm_restore")
    ap.add_argument("--image", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--deg", default="inpainting",
                    choices=["inpainting", "sr2", "sr4", "colorization",
                             "deblur", "deblur_aniso", "sr_conv2",
                             "sr_conv4", "cs_wh", "denoising"])
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--sigma_y", type=float, default=0.0)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..core import io as pio
    from ..models.diffusion import imagenet256_unet, init_unet_params
    from ..models.diffusion import svd_ops as S

    img = pio.load_rgb(args.image)
    h, w = img.shape[:2]
    assert h == w == 256, "the 256x256 uncond model expects 256x256 input"
    x = jnp.asarray(img)[None] * 2.0 - 1.0

    if args.deg == "inpainting":
        rng = np.random.default_rng(args.seed)
        mask = jnp.asarray((rng.random((h, w)) < 0.5).astype(np.float32))
        factory = lambda m=mask: S.inpainting_op(m)
    elif args.deg in ("sr2", "sr4"):
        r = int(args.deg[-1])
        factory = lambda r=r: S.super_resolution_op(h, w, r)
    elif args.deg == "colorization":
        factory = lambda: S.colorization_op(h, w)
    elif args.deg == "deblur_aniso":
        # the reference's anisotropic pair (svd_operators.py:1094 usage
        # in main.py): wide sigma on x, narrow on y
        xs = np.arange(-4, 5, dtype=np.float64)
        kx = np.exp(-xs ** 2 / (2 * 9.0))
        ky = np.exp(-xs ** 2 / (2 * 1.0))
        factory = lambda: S.deblurring2d_op(ky / ky.sum(), kx / kx.sum(),
                                            h, w)
    elif args.deg in ("sr_conv2", "sr_conv4"):
        r = int(args.deg[-1])
        xs = np.arange(-4, 5, dtype=np.float64)
        k = np.exp(-xs ** 2 / (2 * (r / 2) ** 2))
        factory = lambda k=k, r=r: S.sr_conv_op(k, h, w, r)
    elif args.deg == "cs_wh":
        factory = lambda: S.walsh_hadamard_cs_op(h, w, ratio=4,
                                                 seed=args.seed)
    elif args.deg == "denoising":
        factory = lambda: S.denoising_op()
    else:
        k = np.array([0.06136, 0.24477, 0.38774, 0.24477, 0.06136])
        factory = lambda k=k: S.deblurring_op(k, h, w)

    model = imagenet256_unet()
    if args.checkpoint:
        from ..models.diffusion.convert import load_torch_checkpoint

        params = jax.tree_util.tree_map(
            jnp.asarray, load_torch_checkpoint(args.checkpoint))
    else:
        print("WARNING: no checkpoint — random UNet, output will be noise")
        params = init_unet_params(model)

    y = factory().A(x)
    pio.save_rgb(np.asarray(jnp.clip((y[0] + 1) / 2, 0, 1)),
                 args.out.replace(".png", "_degraded.png"))
    out = S.ddnm_plus_sample(model, params, y, factory,
                             jax.random.PRNGKey(args.seed),
                             sigma_y=args.sigma_y, t_sampling=args.steps)
    pio.save_rgb(np.asarray(out[0]), args.out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
