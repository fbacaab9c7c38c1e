"""Standalone DDNM image-restoration CLI.

Reference: models/DDNM's main CLI paths (guided_diffusion/diffusion.py
:115-433 + functions/svd_ddnm.py) — apply a degradation operator to an
image and restore it with DDNM/DDNM+ over the guided-diffusion UNet.

    python -m pointdreamer_tpu.cli.ddnm_restore --image in.png \
        --deg inpainting|sr2|sr4|colorization|deblur|deblur_aniso| \
              sr_conv2|sr_conv4|cs_wh|denoising \
        --checkpoint 256x256_diffusion_uncond.pt --out out.png \
        [--sigma_y 0.0] [--steps 100]

Dataset mode (reference main.py --path_y ImageNet/CelebA/LSUN runs, with
folders of images standing in for the torchvision downloads):

    python -m pointdreamer_tpu.cli.ddnm_restore --image_dir imgs/ \
        --dataset IMAGENET --out outdir/ --deg sr4 [--limit N] [--batch 8]
"""
import argparse
import os


def main():
    ap = argparse.ArgumentParser("ddnm_restore")
    ap.add_argument("--image", default=None, help="single 256x256 image")
    ap.add_argument("--image_dir", default=None,
                    help="folder of images (dataset mode)")
    ap.add_argument("--dataset", default="IMAGENET",
                    help="preprocessing semantics: IMAGENET|CELEBA|LSUN|"
                         "OOD|CIFAR10 (models/DDNM/datasets)")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--batch", type=int, default=8)
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

    if (args.image is None) == (args.image_dir is None):
        ap.error("exactly one of --image / --image_dir is required")
    if args.image_dir:
        from ..models.diffusion.datasets import get_dataset

        ds = get_dataset(args.dataset, args.image_dir, image_size=256,
                         limit=args.limit)
        batches = ds.batches(args.batch)
        h = w = 256
    else:
        img = pio.load_rgb(args.image)
        h, w = img.shape[:2]
        assert h == w == 256, \
            "the 256x256 uncond model expects 256x256 input"
        batches = iter([([args.image], img[None])])

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

    dir_mode = args.image_dir is not None
    if dir_mode:
        os.makedirs(args.out, exist_ok=True)
    for names, imgs in batches:
        x = jnp.asarray(imgs) * 2.0 - 1.0
        y = factory().A(x)
        out = S.ddnm_plus_sample(model, params, y, factory,
                                 jax.random.PRNGKey(args.seed),
                                 sigma_y=args.sigma_y,
                                 t_sampling=args.steps)
        deg = np.asarray(jnp.clip((y + 1) / 2, 0, 1))
        savable = deg.ndim == 4 and deg.shape[-1] == 3
        if dir_mode:
            for i, nm in enumerate(names):
                stem = os.path.splitext(os.path.basename(nm))[0]
                if savable:
                    pio.save_rgb(deg[i], os.path.join(
                        args.out, stem + "_degraded.png"))
                pio.save_rgb(np.asarray(out[i]),
                             os.path.join(args.out, stem + ".png"))
                print("wrote", os.path.join(args.out, stem + ".png"))
        else:
            if savable:
                pio.save_rgb(deg[0],
                             args.out.replace(".png", "_degraded.png"))
            pio.save_rgb(np.asarray(out[0]), args.out)
            print("wrote", args.out)


if __name__ == "__main__":
    main()
