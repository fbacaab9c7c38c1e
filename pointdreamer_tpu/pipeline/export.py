"""Stage: write the textured mesh (OBJ + MTL + PNG).

Reference: save_textured_mesh (demo.py:264-307) — savemeshtes2 OBJ writer,
texture PNG flipped vertically (v=0 at the bottom row, OBJ convention),
plus an RGBA atlas-without-background debug image.
"""
from __future__ import annotations

import os

import numpy as np

from ..core import io as pio


def save_multi_material_obj(vertices, faces, face_view_ids, face_vertex_uvs,
                            view_images, save_path,
                            name: str = "model_normalized"):
    """Legacy multi-material export: faces grouped by their source view,
    each group textured by that view's inpainted image
    (reference ours_utils.py save-mtl/obj block :418-455, the
    `unproject_by='face'` mode of recon_one_shape).

    face_view_ids [F] int (view per face, <0 -> view 0);
    face_vertex_uvs [F,3,2] per-corner uv in the assigned view's image;
    view_images [V,res,res,3] float in [0,1].
    """
    os.makedirs(save_path, exist_ok=True)
    v = np.asarray(vertices)
    f = np.asarray(faces, np.int64)
    fv = np.asarray(face_view_ids)
    fv = np.where(fv < 0, 0, fv)
    uvs = np.asarray(face_vertex_uvs)
    imgs = np.asarray(view_images)
    n_views = imgs.shape[0]

    for i in range(n_views):
        pio.save_rgb(imgs[i], os.path.join(save_path, f"{i}.png"),
                     flip_vertical=True)  # vt v-up convention
    with open(os.path.join(save_path, f"{name}.mtl"), "w") as fid:
        for i in range(n_views):
            fid.write(f"newmtl material_{i}\nKd 1 1 1\nKa 0 0 0\n"
                      f"Ks 0.4 0.4 0.4\nNs 10\nillum 2\n"
                      f"map_Kd {i}.png\n\n")
    with open(os.path.join(save_path, f"{name}.obj"), "w") as fid:
        fid.write(f"mtllib {name}.mtl\n")
        for p in v:
            fid.write(f"v {p[0]:f} {p[1]:f} {p[2]:f}\n")
        for vt in uvs.reshape(-1, 2):
            fid.write(f"vt {vt[0]:f} {1.0 - vt[1]:f}\n")
        for i in range(n_views):
            fid.write(f"usemtl material_{i}\n")
            for fi in np.nonzero(fv == i)[0]:
                a = f[fi] + 1
                t = np.array([3 * fi, 3 * fi + 1, 3 * fi + 2]) + 1
                fid.write(f"f {a[0]}/{t[0]} {a[1]}/{t[1]} "
                          f"{a[2]}/{t[2]}\n")
    return os.path.join(save_path, f"{name}.obj")


def save_textured_mesh(vertices, uvs, faces, face_uv_idx, atlas_img, mask,
                       output_root: str, name: str = "model_normalized"):
    """atlas_img [R,R,3] float in [0,1] with row 0 = v~0; mask [R,R] bool."""
    models_dir = os.path.join(output_root, "models")
    others_dir = os.path.join(output_root, "others")
    os.makedirs(models_dir, exist_ok=True)
    os.makedirs(others_dir, exist_ok=True)

    if type(atlas_img).__module__.startswith("jax"):
        import jax.numpy as jnp

        # one uint8 transfer instead of two float32 ones (12 MB -> 3 MB);
        # quantize on device, fetch inside the IO worker so the ~0.2 s
        # tunnel transfer + cv2 encodes (GIL-released) overlap the OBJ
        # text build below
        atlas_dev = jnp.clip(atlas_img * 255.0 + 0.5,
                             0.0, 255.0).astype(jnp.uint8)
    else:
        atlas_dev = (np.clip(np.asarray(atlas_img), 0.0, 1.0) * 255.0
                     + 0.5).astype(np.uint8)

    def write_pngs(atlas_dev=atlas_dev, mask=mask):
        atlas = np.asarray(atlas_dev)
        pio.save_rgb(atlas, os.path.join(models_dir, f"{name}.png"),
                     flip_vertical=True)
        m = pio.fetch_bool(mask)   # packed-bit transfer (1 MB -> 128 KB)
        rgba = np.concatenate(
            [atlas, np.where(m, 255, 0).astype(np.uint8)[..., None]],
            axis=-1)
        pio.save_rgb(rgba,
                     os.path.join(others_dir, "atlas_wo_background.png"),
                     flip_vertical=True)

    pio.submit_async_io(write_pngs)
    obj_path = os.path.join(models_dir, f"{name}.obj")
    try:
        pio.save_textured_obj(np.asarray(vertices), np.asarray(uvs),
                              np.asarray(faces), np.asarray(face_uv_idx),
                              obj_path)
    finally:
        # the PNGs are part of the deliverable; flushing on the error path
        # too keeps a failed OBJ build from leaking pending futures into an
        # unrelated later flush_async_io() call
        pio.flush_async_io()
    return obj_path
