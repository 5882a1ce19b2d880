"""Deformation graph tests: weighting parity, identity behavior, rigid-motion
recovery through the GN/CG solve, incremental activation."""

import jax.numpy as jnp
import numpy as np
import pytest

from elasticfusion_tpu.deformation import (
    Deformation,
    GraphState,
    apply_graph_to_surfels,
    blend_points,
    empty_graph,
    weight_points,
)
from elasticfusion_tpu.surfels import empty_map


def _line_graph(n=40, cap=64, spacing=0.25, tick_step=100.0):
    """Nodes along the x axis, times increasing — the canonical temporal
    graph shape produced by map sampling."""
    d = Deformation(node_capacity=cap)
    pos = np.zeros((n, 3))
    pos[:, 0] = np.arange(n) * spacing
    times = np.arange(n) * tick_step + 1.0
    d._init_graph(pos, times)
    return d


def test_weight_points_basic():
    d = _line_graph()
    g = d.graph
    pts = jnp.asarray([[2.0, 0.1, 0.0], [7.3, -0.2, 0.0]], jnp.float32)
    times = jnp.asarray([2.0 / 0.25 * 100.0, 7.3 / 0.25 * 100.0], jnp.float32)
    nodes, w = weight_points(pts, times, g)
    w = np.asarray(w)
    nodes = np.asarray(nodes)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)
    # nearest node to x=2.0 (node 8) must be among the k chosen, with the
    # largest weight
    assert 8 in nodes[0]
    assert nodes[0][np.argmax(w[0])] == 8


def test_identity_graph_is_noop():
    d = _line_graph()
    g = d.graph
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(50, 3)), jnp.float32)
    times = jnp.asarray(np.full(50, 1500.0), jnp.float32)
    nodes, w = weight_points(pts, times, g)
    out = np.asarray(blend_points(pts, nodes, w, g))
    np.testing.assert_allclose(out, np.asarray(pts), atol=1e-5)


def test_surfel_application_identity():
    d = _line_graph()
    m = empty_map(256)
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(3, 256)).astype(np.float32)
    nrm = rng.normal(size=(3, 256)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=0, keepdims=True)
    m = m._replace(
        pos=jnp.asarray(pos),
        normal=jnp.asarray(nrm),
        init_t=jnp.asarray(np.full(256, 2000.0, np.float32)),
        count=jnp.int32(256),
    )
    new_pos, new_nrm = apply_graph_to_surfels(m, d.graph)
    np.testing.assert_allclose(np.asarray(new_pos), pos, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_nrm), nrm, atol=1e-4)


def test_constrain_recovers_translation():
    """Constraints that uniformly shift recent points by +delta in y must pull
    the recent half of the graph along while keeping rotations orthogonal."""
    d = _line_graph(n=40)
    delta = np.array([0.0, 0.12, 0.0])
    # constraints on points living near the newest nodes
    for xi in np.linspace(7.0, 9.5, 8):
        src = np.array([xi, 0.0, 0.0])
        t = xi / 0.25 * 100.0
        d.add_constraint(src, src + delta, t, t)
    ok, _, _, _ = d.constrain([], time=5000, fern_match=False,
                              pose_history=[], relax_graph=False)
    assert ok
    g = d.graph
    # a test point amid the constrained region moves by ~delta
    p = jnp.asarray([[8.2, 0.0, 0.0]], jnp.float32)
    tt = jnp.asarray([8.2 / 0.25 * 100.0], jnp.float32)
    nodes, w = weight_points(p, tt, g)
    moved = np.asarray(blend_points(p, nodes, w, g))[0]
    np.testing.assert_allclose(moved, np.array([8.2, 0.12, 0.0]), atol=0.02)
    # rotations stay near-orthogonal (E_rot keeps them in shape)
    R = np.asarray(g.R[: int(g.n_nodes)])
    orth = np.matmul(R.transpose(0, 2, 1), R) - np.eye(3)
    assert np.abs(orth).max() < 0.05


def test_incremental_activation_freezes_old_nodes():
    d = _line_graph(n=40)
    d.last_deform_time = 2000.0  # nodes 0..19 frozen (times 1..1901)
    for xi in np.linspace(7.0, 9.5, 8):
        src = np.array([xi, 0.0, 0.0])
        t = xi / 0.25 * 100.0
        d.add_constraint(src, src + np.array([0.0, 0.1, 0.0]), t, t)
    ok, _, _, _ = d.constrain([], time=5000, fern_match=False,
                              pose_history=[], relax_graph=False)
    assert ok
    g = d.graph
    t_old = np.asarray(g.t[:19])
    assert np.abs(t_old).max() < 1e-7, "frozen nodes moved"
    t_new = np.asarray(g.t[25:40])
    assert np.abs(t_new).max() > 0.05, "active nodes did not move"


def test_fern_early_out_on_small_error():
    d = _line_graph(n=40)
    # constraints already satisfied -> meanConsErr ~ 0 < 0.06 -> no deform
    for xi in np.linspace(7.0, 9.0, 5):
        src = np.array([xi, 0.0, 0.0])
        t = xi / 0.25 * 100.0
        d.add_constraint(src, src, t, t)
    ok, _, _, _ = d.constrain([], time=5000, fern_match=True,
                              pose_history=[], relax_graph=False)
    assert not ok


def test_apply_to_poses():
    d = _line_graph(n=40)
    delta = np.array([0.0, 0.1, 0.0])
    for xi in np.linspace(5.0, 9.5, 12):
        src = np.array([xi, 0.0, 0.0])
        t = xi / 0.25 * 100.0
        d.add_constraint(src, src + delta, t, t)
    T = np.eye(4)
    T[:3, 3] = [8.0, 0.0, 0.0]
    poses = [(int(8.0 / 0.25 * 100.0), T)]
    ok, fern_poses, _, _ = d.constrain(poses, time=5000, fern_match=False,
                                       pose_history=[], relax_graph=False)
    assert ok
    new_poses = d._apply_to_poses(poses, d.graph)
    np.testing.assert_allclose(
        new_poses[0][1][:3, 3], np.array([8.0, 0.1, 0.0]), atol=0.02
    )
    R = new_poses[0][1][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_temporal_window_at_production_capacity():
    """Regression: at node_capacity=1024 with only ~60 live nodes, the padded
    tail of the node timeline must sort ABOVE every live time so that
    searchsorted brackets the query.  A zero tail made every query resolve to
    the newest lookback window regardless of its timestamp (the reference's
    temporal association, DeformationGraph.cpp:268-373, silently vanished)."""
    n = 60
    d = _line_graph(n=n, cap=1024)
    g = d.graph
    assert np.isinf(np.asarray(g.times)[n:]).all()

    # early-, mid-, and late-time queries: the chosen window must bracket the
    # query time (contain the temporally-nearest node), not the newest nodes
    for x in (1.0, 7.0, 13.0):
        t = x / 0.25 * 100.0
        nearest = int(round(x / 0.25))
        pts = jnp.asarray([[x, 0.0, 0.0]], jnp.float32)
        tq = jnp.asarray([t], jnp.float32)
        nodes, w = weight_points(pts, tq, g)
        nodes = np.asarray(nodes)[0]
        w = np.asarray(w)[0]
        assert nearest in nodes, (
            f"query t={t}: window {sorted(nodes)} misses nearest node {nearest}"
        )
        # all chosen nodes lie within the lookback window of the nearest node
        assert np.all(np.abs(nodes - nearest) <= 20), nodes
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-5)


def test_constrain_early_time_at_production_capacity():
    """An early-time constraint on a 1024-capacity graph must deform the
    early nodes, leaving the newest nodes untouched."""
    n = 60
    d = _line_graph(n=n, cap=1024)
    for xi in np.linspace(1.0, 3.0, 6):
        src = np.array([xi, 0.0, 0.0])
        t = xi / 0.25 * 100.0
        d.add_constraint(src, src + np.array([0.0, 0.1, 0.0]), t, t)
    ok, _, _, _ = d.constrain([], time=7000, fern_match=False,
                              pose_history=[], relax_graph=False)
    assert ok
    g = d.graph
    t_early = np.asarray(g.t[2:14])
    assert np.abs(t_early).max() > 0.05, "early nodes did not move"
    # E_reg smoothly decays the motion along the temporal chain; the far end
    # must see an order of magnitude less motion than the constrained region
    t_late = np.asarray(g.t[40:n])
    assert np.abs(t_late).max() < 0.02, "late nodes moved for an early constraint"
