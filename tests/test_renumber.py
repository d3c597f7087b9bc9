import numpy as np

from foamtpu.mesh import renumber
from foamtpu.mesh.check import check

from test_blockmesh import cavity_mesh


def test_rcm_reduces_bandwidth_on_shuffled_mesh():
    poly = cavity_mesh(12)
    rng = np.random.default_rng(3)
    # scramble the cell ordering to emulate an imported unstructured mesh
    shuffled, _ = renumber.apply_ordering(poly, rng.permutation(poly.n_cells)), None
    bw_shuffled = renumber.bandwidth(shuffled)
    fixed, order = renumber.renumber(shuffled)
    bw_fixed = renumber.bandwidth(fixed)
    assert bw_shuffled > 50
    assert bw_fixed <= 2 * 12  # near the structured optimum (ny)
    # still a valid mesh with identical totals
    s0 = check(poly)
    s1 = check(fixed)
    np.testing.assert_allclose(s1["totalVolume"], s0["totalVolume"], rtol=1e-12)
    assert s1["nInternalFaces"] == s0["nInternalFaces"]


def test_rcm_improves_stencil_coverage():
    from foamtpu.mesh import to_device

    poly = cavity_mesh(12)
    rng = np.random.default_rng(4)
    shuffled = renumber.apply_ordering(poly, rng.permutation(poly.n_cells))
    fixed, _ = renumber.renumber(shuffled)
    dev_bad = to_device(shuffled)
    dev_good = to_device(fixed)
    # stencil fallback fraction drops substantially after renumbering
    # (RCM optimises bandwidth, not perfectly-constant offsets, so the
    # residual fraction is larger than for native blockMesh ordering)
    frac_bad = dev_bad.fb_cells.shape[0] / (2 * poly.n_internal_faces)
    frac_good = dev_good.fb_cells.shape[0] / (2 * poly.n_internal_faces)
    assert frac_good < 0.6 * frac_bad
    # native blockMesh ordering: (near-)zero fallback
    frac_native = to_device(poly).fb_cells.shape[0] / (2 * poly.n_internal_faces)
    assert frac_native < 0.01
