"""Golden-fixture parity: pipeline MATH vs the reference's own torch code.

The reference functions are AST-extracted from /root/reference and run on
CPU as numerical oracles (tests/reference_oracle.py) — this covers the
pipeline math the per-module network parity tests don't:

  1. NBF border-shrink masks    (unproject.py:429-475)
  2. dilate_atlas nearest fill  (unproject.py:480-504 + ours_utils.py:610)
  3. sparse-image synthesis + shrink-to-fit ratio logic
                                (ours_utils.py:954-1044)
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from reference_oracle import load_oracles


@pytest.fixture(scope="module")
def oracle():
    return load_oracles()


def _blob_mask(rng, res, n_blobs=3, r=(6, 14)):
    """A smooth random blobby boolean mask."""
    m = np.zeros((res, res), bool)
    yy, xx = np.mgrid[:res, :res]
    for _ in range(n_blobs):
        cy, cx = rng.integers(10, res - 10, 2)
        rad = rng.integers(*r)
        m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= rad ** 2
    return m


# ---------------------------------------------------------------------------
# 1. NBF border-shrink
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kernels", [(7,), (5, 3), (0,)])
def test_nbf_shrink_matches_reference(oracle, kernels):
    from pointdreamer_tpu.pipeline.unproject import shrink_view_visibility

    rng = np.random.default_rng(5)
    res, V = 48, 3
    atlas_mask = _blob_mask(rng, res, n_blobs=4)
    vis = np.stack([_blob_mask(rng, res) & atlas_mask for _ in range(V)])

    ref = oracle["get_shrinked_per_view_per_pixel_visibility_torch"](
        per_pixel_mask=torch.from_numpy(atlas_mask),
        per_atlas_pixel_per_view_visibility=torch.from_numpy(
            vis.transpose(1, 2, 0)),           # [res,res,V]
        kernel_sizes=list(kernels))
    ref = np.asarray(ref.numpy()).astype(bool)  # [K,V,res,res]

    mine = np.asarray(shrink_view_visibility(
        jnp.asarray(atlas_mask), jnp.asarray(vis), kernels)).astype(bool)

    assert mine.shape == ref.shape
    np.testing.assert_array_equal(mine, ref)


# ---------------------------------------------------------------------------
# 2. dilate_atlas (nearest fill)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_dilate_atlas_matches_reference(oracle):
    from pointdreamer_tpu.pipeline.complete import dilate_atlas

    rng = np.random.default_rng(7)
    res = 48
    yy, xx = np.mgrid[:res, :res]
    img = np.stack([yy / res, xx / res, (yy + xx) / (2 * res)],
                   axis=-1).astype(np.float32)
    valid = rng.random((res, res)) < 0.25
    img = img * valid[..., None]

    ref = oracle["dilate_atlas"](
        torch.from_numpy(img),
        torch.from_numpy(valid.astype(np.float32)).reshape(1, res, res, 1))
    ref = np.asarray(ref.numpy())

    mine = np.asarray(dilate_atlas(jnp.asarray(img), jnp.asarray(valid)))

    # exact on known texels
    np.testing.assert_array_equal(mine[valid], img[valid])

    # Every fill must come from a TRUE euclidean-nearest valid texel (the
    # contract griddata satisfies).  Integer grids are full of exact-
    # distance ties, so colors can't be compared pixelwise — the distances
    # can.  Brute-force the optimal distance and check the JFA source.
    from pointdreamer_tpu.ops.image import nearest_fill
    _, src = nearest_fill(jnp.asarray(img), jnp.asarray(valid),
                          return_sources=True)
    src = np.asarray(src)
    vr, vc = np.nonzero(valid)
    yy2, xx2 = np.mgrid[:res, :res]
    d_opt = ((yy2[..., None] - vr) ** 2
             + (xx2[..., None] - vc) ** 2).min(axis=-1)
    d_got = (yy2 - src[..., 0]) ** 2 + (xx2 - src[..., 1]) ** 2
    hole = ~valid
    assert valid[src[..., 0], src[..., 1]].all(), "fill from invalid texel"
    frac_opt = (d_got[hole] == d_opt[hole]).mean()
    assert frac_opt > 0.995, f"only {frac_opt:.3%} fills at optimal distance"
    assert (d_got[hole] - d_opt[hole]).max() <= 2  # 1+JFA near-exactness

    # and the resulting field agrees with the reference's up to tie choice
    assert np.abs(mine - ref).mean() < 0.01
    exact = np.all(np.abs(mine - ref) < 1e-6, axis=-1)
    assert exact.mean() > 0.75, f"only {exact.mean():.2%} texels agree exactly"


# ---------------------------------------------------------------------------
# 3. sparse-image synthesis (ours_utils.py:954-1044)
# ---------------------------------------------------------------------------

def _make_case(rng, res, n_pts, valid_frac, disk_r):
    """Points at distinct pixels inside a centered disk foreground."""
    yy, xx = np.mgrid[:res, :res]
    fg = (yy - res / 2) ** 2 + (xx - res / 2) ** 2 <= disk_r ** 2
    fr, fc = np.nonzero(fg)
    sel = rng.choice(len(fr), size=n_pts, replace=False)
    rows, cols = fr[sel], fc[sel]
    colors = np.stack([rows / res, cols / res,
                       0.5 * np.ones_like(rows)], axis=-1).astype(np.float32)
    valid = rng.random(n_pts) < valid_frac
    return fg, rows, cols, colors, valid


def _run_mine(fg, rows, cols, colors, valid, res, thresh=0.82):
    from pointdreamer_tpu.pipeline.project import (ProjectionData,
                                                   make_sparse_images)

    V, N = 1, len(rows)
    uvs = np.stack([cols, rows], axis=-1).astype(np.float32) / res
    proj = ProjectionData(
        hard_masks=jnp.asarray(fg[None]),
        face_idxs=jnp.zeros((V, res, res), jnp.int32),
        mesh_depths=jnp.full((V, res, res), np.inf),
        uv_centers=jnp.zeros((V, 1, 2)),
        uv_scales=jnp.ones((V, 1, 1)),
        padding=0.0,
        point_uvs=jnp.asarray(uvs[None]),
        point_depths=jnp.ones((V, N)),
        point_validation=jnp.asarray(valid[None]),
    )
    return make_sparse_images(proj, jnp.asarray(colors), res=res,
                              mask_ratio_thresh=thresh)


def _run_oracle(oracle, fg, rows, cols, colors, valid, res, thresh=0.82):
    pix = torch.from_numpy(np.stack([rows, cols], axis=-1)).long()
    out = oracle["get_one_sparse_img"](
        point_pixels=pix, colors=torch.from_numpy(colors),
        point_validation=torch.from_numpy(valid),
        hard_mask=torch.from_numpy(fg), res=res,
        point_size=1, edge_point_size=1, mask_ratio_thresh=thresh)
    sparse, m0, m2, ratio, scale = out
    # the reference flips rows at the very end (its camera convention);
    # ours keeps one consistent orientation throughout — unflip to compare
    sparse = np.flip(sparse.numpy().transpose(1, 2, 0), axis=0)
    m0 = np.flip(m0.numpy()[0], axis=0)
    m2 = np.flip(m2.numpy()[0], axis=0)
    scale = float(scale) if torch.is_tensor(scale) else scale
    return sparse, m0, m2, float(ratio), scale


def test_sparse_image_matches_reference_no_rescale(oracle):
    rng = np.random.default_rng(11)
    res = 64
    fg, rows, cols, colors, valid = _make_case(
        rng, res, n_pts=500, valid_frac=0.8, disk_r=24)

    mine = _run_mine(fg, rows, cols, colors, valid, res)
    r_sparse, r_m0, r_m2, r_ratio, r_scale = _run_oracle(
        oracle, fg, rows, cols, colors, valid, res)

    assert r_scale == 1  # below threshold: no shrink
    assert float(mine.scale_factors[0]) == 1.0
    np.testing.assert_array_equal(np.asarray(mine.hard_mask0[0]), r_m0)
    np.testing.assert_array_equal(np.asarray(mine.hard_mask2[0]), r_m2)
    np.testing.assert_allclose(float(mine.mask_ratios[0]), r_ratio, atol=1e-6)

    got = np.asarray(mine.sparse_imgs[0])
    # splatted point pixels must agree exactly; edge-augmented pixels pick
    # the nearest valid point — exact-distance ties may resolve differently
    edge = np.asarray(oracle["get_forground_inner_edge_mask"](
        torch.from_numpy(np.flip(fg, axis=0).copy())).numpy())
    edge = np.flip(edge, axis=0)
    np.testing.assert_allclose(got[~edge], r_sparse[~edge], atol=1e-6)
    agree = np.all(np.abs(got[edge] - r_sparse[edge]) < 1e-6, axis=-1)
    assert agree.mean() > 0.8, f"edge-pixel agreement {agree.mean():.2%}"


def test_sparse_image_shrink_to_fit_matches_reference(oracle):
    """mask_ratio > 0.82 triggers the shrink: the scale factor and the
    rescaled point painting must match the reference math."""
    rng = np.random.default_rng(13)
    res = 96
    fg, rows, cols, colors, valid = _make_case(
        rng, res, n_pts=500, valid_frac=0.5, disk_r=42)

    mine = _run_mine(fg, rows, cols, colors, valid, res)
    r_sparse, r_m0, r_m2, r_ratio, r_scale = _run_oracle(
        oracle, fg, rows, cols, colors, valid, res)

    assert 0 < r_scale < 1, "case must trigger the shrink branch"
    np.testing.assert_allclose(float(mine.scale_factors[0]), r_scale,
                               rtol=1e-6)
    # the foreground mask is shrunk by a dynamic resize in the reference
    # and by a static-shape scale_and_translate here — compare by IoU
    # (the reference rounds the resize target to an even remainder —
    # after_res — so its effective mask scale differs from the point
    # scale by up to 1/after_res; a boundary band can't match exactly)
    m0 = np.asarray(mine.hard_mask0[0]) > 0.5
    inter = (m0 & (r_m0 > 0.5)).sum()
    union = (m0 | (r_m0 > 0.5)).sum()
    assert inter / union > 0.8, f"shrunk-mask IoU {inter/union:.2f}"
    # painted pixels: identical rescale math up to fp rounding at pixel
    # boundaries + edge-augmentation ties
    got = np.asarray(mine.sparse_imgs[0])
    same = np.all(np.abs(got - r_sparse) < 1e-6, axis=-1)
    assert same.mean() > 0.97, f"pixel agreement {same.mean():.2%}"


# ---------------------------------------------------------------------------
# 4. DDNM sampler trajectory vs the reference's own simplified_ddnm_inpainting
# ---------------------------------------------------------------------------

class _EpsStub:
    """Deterministic eps model shared by both samplers (layout-agnostic
    elementwise math, so NCHW torch and NHWC jax agree exactly)."""

    @staticmethod
    def f_np(x, t):
        return np.tanh(x) * 0.1 + 0.01 * np.sin(t / 7.0)

    # torch side: model(xt, t) with xt [1,3,R,R], t [1]
    def __call__(self, xt, t):
        return torch.tanh(xt) * 0.1 + 0.01 * torch.sin(t[0] / 7.0)

    # flax-like side: model.apply({'params': p}, x, t) with x [B,R,R,3]
    def apply(self, variables, x, t):
        return jnp.tanh(x) * 0.1 + 0.01 * jnp.sin(t[0] / 7.0)


class _CudaToCpu:
    """Route the reference's hard-coded .to('cuda') calls to CPU."""

    def __enter__(self):
        self._orig = torch.Tensor.to

        def to(tensor, *args, **kw):
            args = tuple("cpu" if a == "cuda" else a for a in args)
            if kw.get("device") == "cuda":
                kw["device"] = "cpu"
            return self._orig(tensor, *args, **kw)

        torch.Tensor.to = to
        return self

    def __exit__(self, *exc):
        torch.Tensor.to = self._orig


def test_ddnm_sampler_matches_reference_oracle():
    """Run the AST-extracted simplified_ddnm_inpainting (+get_schedule_jump
    +compute_alpha, diffusion.py:459-570,770-812) with a deterministic eps
    stub and a captured noise stream, and assert the scanned jax sampler
    reproduces the trajectory."""
    from types import SimpleNamespace as NS

    from reference_oracle import load_ddnm_oracle
    from pointdreamer_tpu.models.diffusion.ddnm import (
        ddnm_inpaint_batch, make_betas)

    R, steps, T = 16, 5, 1000
    rng = np.random.default_rng(42)
    img = rng.random((R, R, 3)).astype(np.float32)        # HWC in [0,1]
    mask = (rng.random((R, R)) < 0.6).astype(np.float32)  # 1 = known

    # the reference draws: x_T init, then one randn_like per normal step.
    # Its caller (models/DDNM/ddnm_inpainting.py:39-41) feeds
    # masked_imgs [1,1,3,H,W] and masks [1,H,W], so the loop's x_orig is
    # [1,3,H,W] and every draw is [1,3,R,R].
    noise_nchw = [rng.standard_normal((1, 3, R, R)).astype(np.float32)
                  for _ in range(1 + steps)]

    ns = load_ddnm_oracle(noise_nchw)
    betas = torch.from_numpy(make_betas(T)).float()
    fake_self = NS(
        betas=betas, device="cpu",
        args=NS(seed=1234, sigma_y=0.0, eta=0.85),
        config=NS(
            sampling=NS(batch_size=1),
            data=NS(channels=3, image_size=R, rescaled=True,
                    uniform_dequantization=False,
                    gaussian_dequantization=False, logit_transform=False),
            diffusion=NS(num_diffusion_timesteps=T),
            time_travel=NS(T_sampling=steps, travel_length=1,
                           travel_repeat=1)))

    # reference consumes [1,1,3,H,W] images in [0,1] and a [1,H,W] mask
    # (ddnm_inpainting.py:37-41)
    masked_nchw = torch.from_numpy(
        (img * mask[..., None]).transpose(2, 0, 1)[None, None])
    mask_ref = torch.from_numpy(mask)[None]               # [1,R,R]
    with _CudaToCpu():
        ref = ns["simplified_ddnm_inpainting"](
            fake_self, _EpsStub(), masked_nchw, mask_ref)
    ref = ref.numpy()[0, 0].transpose(1, 2, 0)            # -> HWC

    noise_nhwc = jnp.asarray(np.stack(
        [z.transpose(0, 2, 3, 1) for z in noise_nchw]))   # [1+s,1,R,R,3]
    mine = np.asarray(ddnm_inpaint_batch(
        _EpsStub(), {}, jnp.asarray(img * mask[..., None])[None],
        jnp.asarray(mask)[None], jax.random.PRNGKey(0),
        t_sampling=steps, num_timesteps=T, noise=noise_nhwc))[0]

    err = float(np.max(np.abs(mine - ref)))
    assert err < 1e-3, f"jax DDNM trajectory diverges from oracle: {err}"


# ---------------------------------------------------------------------------
# 5. NBF view selection (candidate fallback + softmax -100 masking)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("complete", [False, True])
def test_view_selection_matches_reference(complete):
    """select_views vs the verbatim reference statements
    (unproject.py:324-367)."""
    from reference_oracle import load_view_select_oracle
    from pointdreamer_tpu.pipeline.unproject import select_views

    ns = load_view_select_oracle()
    rng = np.random.default_rng(11)
    res, V, K = 24, 5, 2
    mask = _blob_mask(rng, res, n_blobs=2, r=(5, 9))
    P = int(mask.sum())
    shrunk = rng.random((K, V, res, res)) < 0.25
    vis_pts = rng.random((V, P)) < 0.5
    if complete:
        # guarantee every point visible somewhere so the reference never
        # argmaxes an all-(-100) row (its tie index is arbitrary there;
        # our implementation reports -100 for never-seen instead)
        vis_pts[rng.integers(0, V, P), np.arange(P)] = True
    sim_pts = rng.standard_normal((P, V)).astype(np.float32)
    normals = rng.standard_normal((P, 3)).astype(np.float32)

    ref_ids, ref_cand = ns["select"](
        torch.from_numpy(shrunk), torch.from_numpy(mask),
        [3] * K,  # edge_dilate_kernels: only len() is used in the range
        torch.from_numpy(vis_pts), torch.from_numpy(sim_pts.copy()),
        complete, torch.from_numpy(normals))
    ref_ids, ref_cand = ref_ids.numpy(), ref_cand.numpy()

    # map per-point reference inputs onto the full texel grid
    T = res * res
    mask_flat = mask.reshape(-1)
    vis_full = np.zeros((V, T), bool)
    vis_full[:, mask_flat] = vis_pts
    sim_full = np.zeros((T, V), np.float32)
    sim_full[mask_flat] = sim_pts
    view_id, cand = select_views(
        jnp.asarray(shrunk.reshape(K, V, T)), jnp.asarray(vis_full),
        jnp.asarray(sim_full), jnp.asarray(mask_flat), complete)
    got_ids = np.asarray(view_id)[mask_flat]
    got_cand = np.asarray(cand)[:, mask_flat]

    np.testing.assert_array_equal(got_cand.T, ref_cand)
    if complete:
        seen = ref_cand.sum(1) >= 1
        np.testing.assert_array_equal(got_ids[seen], ref_ids[seen])
        assert np.all(got_ids[~seen] == -100)
    else:
        np.testing.assert_array_equal(got_ids, ref_ids)


# ---------------------------------------------------------------------------
# 6. shrink-to-fit crop bookkeeping (uv_centers / uv_scales / padding)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("rescale", [True, False])
def test_crop_rescale_matches_reference(rescale):
    """project_views' crop math vs the verbatim reference statements
    (ours_utils.py:110-141), fed the SAME camera-space NDC both ways."""
    from reference_oracle import load_crop_rescale_oracle
    from pointdreamer_tpu.core.camera import make_camera_rig
    from pointdreamer_tpu.pipeline.project import project_views

    ns = load_crop_rescale_oracle()
    rng = np.random.default_rng(13)
    # a tiny closed mesh (tetrahedron) + free points
    verts = np.array([[0.2, 0.2, 0.2], [-0.2, -0.2, 0.2],
                      [-0.2, 0.2, -0.2], [0.2, -0.2, -0.2]], np.float32)
    faces = np.array([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]], np.int32)
    pts = (rng.random((50, 3)).astype(np.float32) - 0.5) * 0.4
    rig = make_camera_rig(num_views=4, res=64)

    padding = 0.05
    proj = project_views(rig, jnp.asarray(verts), jnp.asarray(faces),
                         jnp.asarray(pts), crop=rescale, padding=padding)

    # feed the oracle the same NDC the pipeline computed from the rig
    ndc, depth = rig.transform(jnp.asarray(np.vstack([verts, pts])))
    ndc, depth = np.asarray(ndc), np.asarray(depth)
    nV = len(verts)
    pos = torch.from_numpy(
        np.concatenate([ndc[:, :nV], np.ones_like(depth[:, :nV, None]),
                        ], axis=2))                    # [V,nV,3] fake-W pad
    tp = torch.from_numpy(
        np.concatenate([ndc[:, nV:], depth[:, nV:, None]], axis=2))
    _, r_point_uvs, r_centers, r_scales, r_depths, _ = ns["crop"](
        pos, tp, rescale, padding)

    np.testing.assert_allclose(np.asarray(proj.point_uvs),
                               r_point_uvs.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(proj.point_depths),
                               r_depths.numpy(), atol=1e-6)
    if rescale:
        np.testing.assert_allclose(np.asarray(proj.uv_centers),
                                   r_centers.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(proj.uv_scales),
                                   r_scales.numpy(), atol=1e-6)
    assert proj.padding == (padding if rescale else 0.0)


# ---------------------------------------------------------------------------
# 7. depth-test point visibility (the per-view z-buffer decision)
# ---------------------------------------------------------------------------

def test_point_visibility_by_depth_matches_reference(oracle):
    """point_visibility_by_depth vs the extracted reference
    get_point_validation_by_depth (ours_utils.py:153-202): same pixel
    quantization (clip-then-floor, x/y swap) and the same signed
    depth-offset test, on random uvs/depths including points exactly at
    the offset boundary and points projecting onto background pixels."""
    import torch

    from pointdreamer_tpu.ops import splat as osplat

    rng = np.random.default_rng(23)
    V, N, res, offset = 4, 300, 32, 1e-4
    uvs = rng.random((V, N, 2)).astype(np.float32)
    mesh_depth = (rng.random((V, res, res)).astype(np.float32) * 2.0 + 0.5)
    pd = (rng.random((V, N)).astype(np.float32) * 2.5 + 0.25)
    # force boundary cases: exact-equal depths and offset-edge depths
    pix = np.clip(uvs * res, 0, res - 1).astype(np.int64)
    rows, cols = pix[..., 1], pix[..., 0]
    vi = np.arange(V)[:, None]
    pd[:, :50] = mesh_depth[vi, rows, cols][:, :50]            # equal
    pd[:, 50:100] = mesh_depth[vi, rows, cols][:, 50:100] + offset

    ref_vis, ref_pix = oracle["get_point_validation_by_depth"](
        res, torch.from_numpy(uvs), torch.from_numpy(pd),
        torch.from_numpy(mesh_depth), offset=offset)

    mine = np.asarray(osplat.point_visibility_by_depth(
        jnp.asarray(uvs * 2.0 - 1.0), jnp.asarray(pd),
        jnp.asarray(mesh_depth), offset=offset))
    np.testing.assert_array_equal(mine, ref_vis.numpy())


# ---------------------------------------------------------------------------
# 8. face-view assignment (unproject_by='face'), subdivide, Laplacian diffusion
# ---------------------------------------------------------------------------

def _cube_mesh(subdiv=1):
    """A closed 12-triangle cube, optionally 1->4 subdivided (welded)."""
    from pointdreamer_tpu.ops import subdivide as osub

    v = np.array([[x, y, z] for x in (0.0, 1.0) for y in (0.0, 1.0)
                  for z in (0.0, 1.0)])
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
    uvs = np.random.default_rng(0).random((3 * len(f), 2))
    fuv = np.arange(3 * len(f)).reshape(-1, 3)
    for _ in range(subdiv):
        v, f, uvs, fuv = osub.subdivide_with_uv(
            v, f, fuv, uvs, np.arange(len(f)))
    return v, f, uvs, fuv


def test_face_view_assignment_matches_reference():
    """assign_face_view + create_neighbors_tensor + per-face-per-view
    pixel counts vs the extracted reference (ours_utils.py:659-846):
    same neighbor sets, same pixel counts, and the EXACT same per-face
    view id after visible assignment, neighbor propagation to
    convergence, and 3 smoothing passes."""
    import torch

    from pointdreamer_tpu.pipeline import face_assign as pface
    from reference_oracle import load_face_assign_oracle

    ora = load_face_assign_oracle()
    rng = np.random.default_rng(7)
    _, faces, _, _ = _cube_mesh(subdiv=1)           # 48 faces, manifold
    F = len(faces)
    V, res = 4, 24

    # rasterized face ids: half the faces never appear (invisible)
    hidden = rng.choice(F, F // 2, replace=False)
    vis_pool = np.setdiff1d(np.arange(F), hidden)
    face_idxs = np.where(
        rng.random((V, res, res)) < 0.3,
        rng.choice(vis_pool, (V, res, res)), -1).astype(np.int32)
    similarity = rng.standard_normal((F, V))

    neighbors = pface.face_adjacency_neighbors(faces)
    # reference neighbors from the same adjacency pairs
    pairs = np.array([[i, j] for i in range(F)
                      for j in neighbors[i] if j > i])
    ref_nb = ora["create_neighbors_tensor"](
        F, torch.from_numpy(pairs).long()).numpy()
    for i in range(F):
        assert (set(neighbors[i]) - {-1}
                == set(ref_nb[i].tolist()) - {-1}), i

    counts = np.asarray(pface.face_view_pixel_counts(
        jnp.asarray(face_idxs), F))
    ref_counts = ora["get_face_view_pixel_num"](
        torch.from_numpy(face_idxs).long(), cam_num=V,
        face_num=F).numpy()
    np.testing.assert_array_equal(counts, ref_counts.T.astype(counts.dtype))

    mine = pface.assign_face_views(neighbors, counts, similarity)
    ref = ora["assign_face_view"](
        torch.zeros((F, 3)).long(), torch.from_numpy(ref_nb).long(),
        torch.from_numpy(face_idxs).long(),
        torch.from_numpy(similarity.copy()), view_num=V).numpy()
    np.testing.assert_array_equal(mine, ref)

    # per-corner uv gather parity (get_face_vertice_uvs)
    nv = faces.max() + 1
    vuv = rng.random((V, nv, 2)).astype(np.float32)
    ref_uv = ora["get_face_vertice_uvs"](
        torch.from_numpy(faces).long(), torch.from_numpy(ref).long(),
        torch.from_numpy(vuv), view_num=V).numpy()
    fv = np.where(ref < 0, 0, ref)
    mine_uv = vuv[fv[:, None], faces]
    np.testing.assert_allclose(mine_uv, ref_uv, atol=1e-7)


def test_subdivide_with_uv_matches_reference():
    """ops/subdivide.py vs the verbatim reference subdivide_with_uv
    (utils/mesh_utils.py:7-114): identical triangle soup — every face's
    3 corners carry the same (xyz, uv) — under partial subdivision."""
    from pointdreamer_tpu.ops import subdivide as osub
    from reference_oracle import load_subdivide_oracle

    ora = load_subdivide_oracle()
    v, f, uvs, fuv = _cube_mesh(subdiv=1)
    sel = np.array([1, 5, 6, 17, 30, 31])

    rv, rf, ruv, rfuv = ora["subdivide_with_uv"](v, f, fuv, uvs,
                                                 face_index=sel)
    mv, mf, muv, mfuv = osub.subdivide_with_uv(v, f, fuv, uvs, sel)

    def soup(verts, faces, u, fu):
        corners = np.concatenate(
            [verts[faces], u[fu]], axis=-1)             # [F,3,5]
        # canonicalize corner order within each face, then sort faces
        key = np.round(corners, 6)
        order = np.lexsort(key.reshape(len(faces), 3, -1)
                           .transpose(2, 0, 1)[::-1])
        c = np.take_along_axis(corners, order[..., None], axis=1)
        flat = np.round(c.reshape(len(faces), -1), 6)
        return flat[np.lexsort(flat.T[::-1])]

    assert len(rf) == len(mf)
    np.testing.assert_allclose(soup(rv, rf, ruv, rfuv),
                               soup(mv, mf, muv, mfuv), atol=1e-6)


def test_laplacian_diffusion_matches_reference():
    """_diffuse_vertex_colors vs the verbatim reference diffusion loop
    (unproject.py:142-180, Unique3D-style): grow-then-smooth with the
    same round counts — exact agreement up to float associativity."""
    import torch

    from pointdreamer_tpu.pipeline.complete import _diffuse_vertex_colors
    from reference_oracle import load_laplacian_diffusion_oracle

    ora = load_laplacian_diffusion_oracle()
    rng = np.random.default_rng(3)
    v, f, _, _ = _cube_mesh(subdiv=2)               # 98 verts, 192 faces
    nv = int(f.max()) + 1
    colors = rng.random((nv, 3)).astype(np.float32)
    valid = np.zeros(nv, bool)
    valid[rng.choice(nv, 7, replace=False)] = True  # sparse seeds

    ref = ora["diffuse"](
        torch.from_numpy(colors.copy()),
        torch.from_numpy(np.nonzero(valid)[0]),
        torch.from_numpy(f).long(), torch.device("cpu"))[0].numpy()

    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], 0)
    edges = np.concatenate([edges, edges[:, ::-1]], 0)
    mine, colored = _diffuse_vertex_colors(
        jnp.asarray(colors), jnp.asarray(valid.astype(np.float32)),
        jnp.asarray(edges[:, 0]), jnp.asarray(edges[:, 1]),
        invalid_idx_mask=jnp.asarray(~valid))
    assert np.asarray(colored).min() == 1.0         # everything colored
    np.testing.assert_allclose(np.asarray(mine), ref, atol=2e-4)
