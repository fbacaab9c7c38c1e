"""C++ QEM decimation tests (builds libqem.so with g++)."""
import numpy as np
import pytest

from pointdreamer_tpu.native import qem


def _sphere_mesh(n_sub=3):
    # icosphere via repeated subdivision of an octahedron
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], np.float64)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int64)
    for _ in range(n_sub):
        edge_mid = {}
        nv = list(map(tuple, v))
        nf = []

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = (np.asarray(nv[a]) + np.asarray(nv[b])) / 2
                m = m / np.linalg.norm(m)
                edge_mid[key] = len(nv)
                nv.append(tuple(m))
            return edge_mid[key]

        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        v = np.asarray(nv)
        f = np.asarray(nf, np.int64)
    return v.astype(np.float32), f


def test_qem_builds_and_simplifies():
    v, f = _sphere_mesh(3)     # 512 faces
    assert len(f) == 512
    v2, f2 = qem.simplify(v, f, 120)
    assert len(f2) <= 140
    assert len(f2) >= 60
    # still a sphere: radii near 1
    r = np.linalg.norm(v2, axis=1)
    assert 0.85 < r.min() and r.max() < 1.05
    # valid topology: indices in range, no degenerate faces
    assert f2.min() >= 0 and f2.max() < len(v2)
    assert (f2[:, 0] != f2[:, 1]).all()
    # closed surface preserved: every edge shared by exactly 2 faces
    e = np.sort(np.concatenate([f2[:, [0, 1]], f2[:, [1, 2]],
                                f2[:, [2, 0]]]), axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.95


def test_qem_noop_below_target():
    v, f = _sphere_mesh(1)
    v2, f2 = qem.simplify(v, f, 1000)
    np.testing.assert_array_equal(f, f2)


def test_qem_flat_regions_stay_manifold():
    """Deep decimation of a flat-heavy mesh (marching-tets cube) must stay
    2-manifold: the link condition + shortest-edge tie-break prevent the
    fin/mega-valence pathology that scrambled grid>=128 meshes (every
    edge shared by exactly two faces, no boundary, no fins)."""
    import time

    import jax.numpy as jnp

    from pointdreamer_tpu.ops import iso as oiso, sdf as osdf
    from pointdreamer_tpu.pipeline import geometry as pgeo

    field = osdf.eval_sdf_on_grid(
        lambda q: jnp.max(jnp.abs(q), axis=-1) - 0.5, 48,
        pgeo.GRID_LO, pgeo.GRID_HI)
    axis = np.linspace(pgeo.GRID_LO, pgeo.GRID_HI, 48, dtype=np.float32)
    verts, faces = oiso.marching_tets(field, axis)
    assert len(faces) > 20000
    t0 = time.time()
    v2, f2 = qem.simplify(np.asarray(verts), np.asarray(faces), 2000)
    assert time.time() - t0 < 30          # old pathology: minutes
    assert 1000 <= len(f2) <= 2600
    e = np.sort(np.concatenate([f2[:, [0, 1]], f2[:, [1, 2]],
                                f2[:, [2, 0]]]), axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    assert (counts == 2).all()            # watertight, manifold
    err = np.abs(np.max(np.abs(v2), axis=1) - 0.5)
    assert np.percentile(err, 99) < 0.02  # vertices stay on the surface
