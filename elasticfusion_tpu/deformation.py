"""Map deformation — TPU-native equivalent of `Deformation` +
`DeformationGraph` + `CholeskyDecomp`
(/root/reference/Core/Deformation.{h,cpp}, Core/Utils/DeformationGraph.{h,cpp},
Core/Utils/CholeskyDecomp.{h,cpp}; per-surfel application
copy_unstable.vert:132-303).

The reference optimizes a Sumner-style embedded deformation graph on the CPU:
hand-built sparse Jacobian rows into CHOLMOD normal equations
(DeformationGraph.cpp:494-789, CholeskyDecomp.cpp:36-111).  The TPU design
keeps the same energy (wRot=1 orthogonality, wReg=10 edge regularization,
wCon=100 constraints — DeformationGraph.cpp:26-28, residuals :797-887) but
solves Gauss-Newton steps matrix-free: residuals are one fixed-shape jitted
function of the stacked node variables, and JtJ-vector products come from
jvp/vjp pairs inside a conjugate-gradient loop.  Incremental activation
("enabled" nodes newer than lastDeformTime, cpp:436-443) becomes a variable
mask projected inside the CG operator — no ragged shapes, no sparse
bookkeeping, no host round-trips inside the solve.

Node capacity is a config knob (default 1024 = the reference's texture-width
cap, GlobalModel.cpp:25-26); unlike the reference this is not a hard
architecture limit, just an array size.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .surfels import SurfelMap

K_NEIGHBOURS = 4     # k, Deformation.cpp:23
LOOKBACK = 20        # DeformationGraph.cpp:133/269
W_ROT, W_REG, W_CON = 1.0, 10.0, 100.0   # DeformationGraph.cpp:26-28


class GraphState(NamedTuple):
    """Node arrays, fixed capacity NN; slots >= n_nodes are dead."""

    pos: jax.Array      # [NN, 3] node position g_n (world)
    times: jax.Array    # [NN] node init time, nondecreasing
    R: jax.Array        # [NN, 3, 3] affine rotation (identity at rest)
    t: jax.Array        # [NN, 3] translation
    nbr: jax.Array      # [NN, k] temporal neighbours (connectGraphSeq)
    n_nodes: jax.Array  # scalar i32


def empty_graph(capacity: int = 1024) -> GraphState:
    return GraphState(
        pos=jnp.zeros((capacity, 3), jnp.float32),
        times=jnp.full((capacity,), jnp.inf, jnp.float32),
        R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (capacity, 3, 3)),
        t=jnp.zeros((capacity, 3), jnp.float32),
        nbr=jnp.zeros((capacity, K_NEIGHBOURS), jnp.int32),
        n_nodes=jnp.int32(0),
    )


# ---------------------------------------------------------------------------
# Temporal-window kNN weighting (weightVerticesSeq / setPosesSeq /
# copy_unstable.vert's surfel variant)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("mode", "lookback", "k"))
def weight_points(
    points: jax.Array,   # [M, 3]
    times: jax.Array,    # [M]
    g: GraphState,
    mode: str = "back",
    lookback: int = LOOKBACK,
    k: int = K_NEIGHBOURS,
) -> Tuple[jax.Array, jax.Array]:
    """Binary-search the node timeline, gather a `lookback` sequential window,
    pick the k nearest by Euclidean distance, weight (1 - d/dMax)^2 normalized
    (DeformationGraph.cpp:268-373).

    mode="back": window extends backward from the found node, spilling forward
    only at the boundary (weightVerticesSeq/setPosesSeq).  mode="centered":
    lookback/2 back + lookback/2 forward (the GPU surfel path,
    copy_unstable.vert:195-232).  Returns (node idx [M,k], weights [M,k])."""
    M = points.shape[0]
    NN = g.pos.shape[0]
    n = g.n_nodes

    found = jnp.searchsorted(g.times, times)           # dead slots are +inf
    found = jnp.clip(found, 0, n - 1)
    # nearest of the two bracketing nodes
    below = jnp.clip(found - 1, 0, NN - 1)
    d_below = jnp.abs(jnp.take(g.times, below) - times)
    d_at = jnp.abs(jnp.take(g.times, jnp.clip(found, 0, NN - 1)) - times)
    found = jnp.where(d_below < d_at, below, found)

    if mode == "back":
        start = found - (lookback - 1)
    else:
        start = found - (lookback // 2 - 1)
    start = jnp.clip(start, 0, jnp.maximum(n - lookback, 0))

    win = start[:, None] + jnp.arange(lookback)[None, :]          # [M, L]
    win_valid = win < n
    win_c = jnp.clip(win, 0, NN - 1)
    gpos = g.pos[win_c]                                           # [M, L, 3]
    d = jnp.linalg.norm(gpos - points[:, None, :], axis=-1)
    d = jnp.where(win_valid, d, jnp.inf)

    # k nearest + the (k+1)-th for dMax (DeformationGraph.cpp:214)
    neg_top, top_i = jax.lax.top_k(-d, k + 1)
    dists = -neg_top                                              # [M, k+1]
    d_max = jnp.maximum(dists[:, k], 1e-12)
    w = jnp.square(1.0 - dists[:, :k] / d_max[:, None])
    w = jnp.where(jnp.isfinite(dists[:, :k]), w, 0.0)
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
    nodes = jnp.take_along_axis(win_c, top_i[:, :k], axis=1)
    return nodes, w


def blend_points(
    points: jax.Array, nodes: jax.Array, w: jax.Array, g: GraphState
) -> jax.Array:
    """phi(p) = sum_i w_i (R_i (p - g_i) + g_i + t_i)
    (computeVertexPosition, DeformationGraph.cpp:925-942)."""
    gp = g.pos[nodes]                                 # [M, k, 3]
    Rn = g.R[nodes]                                   # [M, k, 3, 3]
    tn = g.t[nodes]
    local = points[:, None, :] - gp
    rotated = jnp.einsum("mkij,mkj->mki", Rn, local)
    return jnp.sum(w[..., None] * (rotated + gp + tn), axis=1)


# ---------------------------------------------------------------------------
# Energy + Gauss-Newton / CG solve
# ---------------------------------------------------------------------------


def _neighbours(n: int, capacity: int, k: int = K_NEIGHBOURS) -> np.ndarray:
    """Temporal connectivity (connectGraphSeq, DeformationGraph.cpp:239-266):
    interior node i links i±1..i±k/2; boundary nodes link the first/last k+1
    block.  Built on the host at graph init (n is known there); dead slots
    self-reference (their edges are masked out by nbr != slot)."""
    nbr = np.arange(capacity, dtype=np.int32)[:, None].repeat(k, axis=1)
    h = k // 2
    for i in range(min(n, capacity)):
        if i < h:
            opts = [m for m in range(min(k + 1, n)) if m != i]
        elif i >= n - h:
            opts = [m for m in range(max(n - (k + 1), 0), n) if m != i]
        else:
            opts = []
            for m in range(h):
                opts += [i - (m + 1), i + (m + 1)]
        opts = (opts + [i] * k)[:k]  # pad degenerate tiny graphs with self
        nbr[i] = opts
    return nbr


class ConstraintSet(NamedTuple):
    """Fixed-capacity constraint block (src deformed towards target)."""

    src: jax.Array        # [NC, 3] source points (world)
    src_nodes: jax.Array  # [NC, k]
    src_w: jax.Array      # [NC, k]
    target: jax.Array     # [NC, 3] absolute target, or relative target point
    tar_nodes: jax.Array  # [NC, k] (for relative constraints)
    tar_w: jax.Array      # [NC, k]
    relative: jax.Array   # [NC] bool
    valid: jax.Array      # [NC] bool


def _residuals(
    R: jax.Array, t: jax.Array, g: GraphState, nbr: jax.Array,
    enabled: jax.Array, cons: ConstraintSet,
):
    """The three energy blocks (sparseResidual, DeformationGraph.cpp:791-887),
    each masked to fixed shape, sqrt-weights folded in."""
    NN = R.shape[0]
    en = enabled.astype(jnp.float32)

    # E_rot: column orthogonality of each enabled node (cpp:797-822)
    c0, c1, c2 = R[:, :, 0], R[:, :, 1], R[:, :, 2]
    erot = jnp.stack(
        [
            jnp.sum(c0 * c1, -1),
            jnp.sum(c0 * c2, -1),
            jnp.sum(c1 * c2, -1),
            jnp.sum(c0 * c0, -1) - 1.0,
            jnp.sum(c1 * c1, -1) - 1.0,
            jnp.sum(c2 * c2, -1) - 1.0,
        ],
        axis=1,
    ) * (en[:, None] * np.sqrt(W_ROT))

    # E_reg: R_j (g_n - g_j) + g_j + t_j - (g_n + t_n) per edge (cpp:824-837),
    # included when either endpoint is enabled
    slot = jnp.arange(NN)
    live = slot < g.n_nodes
    gn = g.pos[nbr]                                        # [NN, k, 3]
    tn = t[nbr]
    pred = jnp.einsum("nij,nkj->nki", R, gn - g.pos[:, None, :]) + (
        g.pos[:, None, :] + t[:, None, :]
    )
    edge_on = (enabled[:, None] | enabled[nbr]) & live[:, None] & (nbr != slot[:, None])
    ereg = (pred - (gn + tn)) * (
        edge_on[..., None].astype(jnp.float32) * np.sqrt(W_REG)
    )

    # E_con: phi(src) - target (absolute) or phi(src) - phi(tar) (cpp:839-882),
    # included when any influencing node is enabled
    gc = g._replace(R=R, t=t)
    src_phi = blend_points(cons.src, cons.src_nodes, cons.src_w, gc)
    tar_phi = blend_points(cons.target, cons.tar_nodes, cons.tar_w, gc)
    tgt = jnp.where(cons.relative[:, None], tar_phi, cons.target)
    influenced = jnp.any(enabled[cons.src_nodes] & (cons.src_w > 0), axis=1) | (
        cons.relative & jnp.any(enabled[cons.tar_nodes] & (cons.tar_w > 0), axis=1)
    )
    con_on = (cons.valid & influenced).astype(jnp.float32)
    econ = (src_phi - tgt) * (con_on[:, None] * np.sqrt(W_CON))

    return erot, ereg, econ


def _flat_residual(x, g, nbr, enabled, cons):
    NN = g.pos.shape[0]
    R = x[: NN * 9].reshape(NN, 3, 3)
    t = x[NN * 9 :].reshape(NN, 3)
    erot, ereg, econ = _residuals(R, t, g, nbr, enabled, cons)
    return jnp.concatenate([erot.reshape(-1), ereg.reshape(-1), econ.reshape(-1)])


@functools.partial(jax.jit, static_argnames=("cg_iters",))
def _gn_step(
    x: jax.Array, g: GraphState, nbr: jax.Array, enabled: jax.Array,
    cons: ConstraintSet, damping: float = 1e-6, cg_iters: int = 128,
):
    """One Gauss-Newton step: delta = argmin |J delta + r|^2 over the enabled
    variables, via CG on (P JtJ P + lambda I).  Replaces the reference's
    CHOLMOD analyze/factorize/solve (CholeskyDecomp.cpp:36-111)."""
    NN = g.pos.shape[0]
    vmask = jnp.concatenate(
        [
            jnp.repeat(enabled.astype(jnp.float32), 9),
            jnp.repeat(enabled.astype(jnp.float32), 3),
        ]
    )

    def rfun(xv):
        return _flat_residual(xv, g, nbr, enabled, cons)

    r0, vjp = jax.vjp(rfun, x)

    def jtj(v):
        v = v * vmask
        _, jv = jax.jvp(rfun, (x,), (v,))
        (jtv,) = vjp(jv)
        return jtv * vmask + damping * v

    b = -(vjp(r0)[0] * vmask)

    # plain CG
    def body(state):
        i, xk, rk, pk, rs = state
        Ap = jtj(pk)
        alpha = rs / jnp.maximum(jnp.dot(pk, Ap), 1e-20)
        xk = xk + alpha * pk
        rk = rk - alpha * Ap
        rs_new = jnp.dot(rk, rk)
        pk = rk + (rs_new / jnp.maximum(rs, 1e-20)) * pk
        return i + 1, xk, rk, pk, rs_new

    def cond(state):
        i, _, _, _, rs = state
        return (i < cg_iters) & (rs > 1e-12)

    x0 = jnp.zeros_like(x)
    state = (jnp.int32(0), x0, b, b, jnp.dot(b, b))
    _, delta, _, _, _ = jax.lax.while_loop(cond, body, state)

    err0 = jnp.sum(r0 * r0)
    return delta, err0


# ---------------------------------------------------------------------------
# Per-surfel application (copy_unstable.vert:132-303)
# ---------------------------------------------------------------------------


@jax.jit
def apply_graph_to_surfels(
    m: SurfelMap, g: GraphState
) -> Tuple[jax.Array, jax.Array]:
    """Deform every surfel (position + normal) through the graph, centered
    temporal window, normals via inverse-transpose of the blended rotation's
    node pieces (copy_unstable.vert:290-296)."""
    pts = m.pos.T                                    # [N, 3]
    nodes, w = weight_points(pts, m.init_t, g, mode="centered")
    new_pos = blend_points(pts, nodes, w, g)

    # per-node inverse-transpose (cheap: <= capacity 3x3 inverses)
    Rit = jnp.transpose(jnp.linalg.inv(g.R), (0, 2, 1))
    Rn = Rit[nodes]                                  # [N, k, 3, 3]
    nrm = jnp.einsum("mkij,mj->mki", Rn, m.normal.T)
    new_nrm = jnp.sum(w[..., None] * nrm, axis=1)
    ln = jnp.linalg.norm(new_nrm, axis=1, keepdims=True)
    new_nrm = new_nrm / jnp.maximum(ln, 1e-12)
    return new_pos.T, new_nrm.T


# ---------------------------------------------------------------------------
# Host-side orchestration (Deformation / DeformationGraph classes)
# ---------------------------------------------------------------------------


class HostConstraint:
    """Deformation::Constraint (Deformation.h): src/target points + times."""

    __slots__ = ("src", "target", "src_time", "target_time", "relative", "pin")

    def __init__(self, src, target, src_time, target_time, relative=False, pin=False):
        self.src = np.asarray(src, np.float64)
        self.target = np.asarray(target, np.float64)
        self.src_time = int(src_time)
        self.target_time = int(target_time)
        self.relative = relative
        self.pin = pin


@functools.partial(jax.jit, static_argnames=("rate",))
def _sample_every(pos, init_t, count, rate: int):
    """Every rate-th surfel's (position [M,3], init time [M], live count) —
    device-side subsample of the map (the GPU sample.geom pass's
    equivalent).  Uses an explicit index gather: a stride-5000 slice lowers
    to a ~250 ms scalar walk on TPU, the small gather is microseconds.  The
    count passes through so the caller holds an un-donated copy."""
    idx = jnp.arange(0, pos.shape[1], rate, dtype=jnp.int32)
    return jnp.take(pos, idx, axis=1).T, jnp.take(init_t, idx), count + 0


class Deformation:
    """Host orchestrator mirroring the reference Deformation class: samples
    graph nodes from the map each frame, accumulates constraints, optimizes,
    and exposes the optimized GraphState for clean()'s per-surfel pass."""

    def __init__(self, node_capacity: int = 1024, sample_rate: int = 5000,
                 constraint_capacity: int = 1024):
        self.node_capacity = node_capacity
        self.sample_rate = sample_rate
        self.constraint_capacity = constraint_capacity
        self.graph: Optional[GraphState] = None
        self.constraints: List[HostConstraint] = []
        self.last_deform_time = 0
        self.deforms = 0
        self._pending = None
        self._pending_from = None
        self._stale = False

    # -- graph (re)initialization -------------------------------------------
    def sample_graph_model(self, m: SurfelMap) -> None:
        """Every sample_rate-th surfel becomes a node (sample.geom:33-39);
        node time = surfel init time; temporal order is guaranteed by the
        map's append-ordered layout (Deformation.cpp:294-297 asserts it).

        LAZY: per frame this enqueues one small device gather and keeps the
        handles; the host graph (kNN tables, device uploads) is only built
        when a loop closure actually optimizes (`_materialize`).  Building
        it every frame cost ~300 ms/frame in tiny dispatches and syncs."""
        self._pending = _sample_every(m.pos, m.init_t, m.count, self.sample_rate)
        self._pending_from = None
        self._stale = True

    def set_sampled(self, pos_sub, times_sub, count) -> None:
        """Accept a node sample computed inside the per-frame device program
        (engine returns `_sample_every`'s output) instead of dispatching a
        separate gather — zero extra dispatches per frame."""
        self._pending = (pos_sub, times_sub, count)
        self._pending_from = None
        self._stale = True

    def sample_graph_from(self, other: "Deformation") -> None:
        """Resample at 1/5 rate from another deformation's node set
        (sampleGraphFrom, Deformation.cpp:209-230) — lazily, see above."""
        self._pending = None
        self._pending_from = other
        self._stale = True

    def _materialize(self) -> None:
        """Resolve the deferred sampling into an initialized graph."""
        if not self._stale:
            return
        self._stale = False
        if self._pending_from is not None:
            other = self._pending_from
            other._materialize()
            if other.graph is None:
                self.graph = None
                return
            n = int(other.graph.n_nodes)
            idx = np.arange(0, n, 5)
            if len(idx) <= K_NEIGHBOURS:
                self.graph = None
                return
            pos = np.asarray(other.graph.pos)[idx]
            times = np.asarray(other.graph.times)[idx]
            self._init_graph(pos, times)
            return
        if self._pending is None:
            self.graph = None
            return
        pos_sub, times_sub, count = self._pending
        n = int(count)
        n_idx = (n + self.sample_rate - 1) // self.sample_rate
        if n_idx <= K_NEIGHBOURS:
            self.graph = None
            return
        pos = np.asarray(pos_sub)[:n_idx][: self.node_capacity]
        times = np.asarray(times_sub)[:n_idx][: self.node_capacity]
        self._init_graph(pos, times)

    def _init_graph(self, pos: np.ndarray, times: np.ndarray) -> None:
        # pad on the HOST to the fixed capacity: a `.at[:n].set` with a
        # python n re-traces/compiles for every new node count (i.e. every
        # frame while the map grows)
        cap = self.node_capacity
        g = empty_graph(cap)
        n = len(pos)
        pos_pad = np.zeros((cap, 3), np.float32)
        pos_pad[:n] = pos
        # dead slots MUST be +inf: weight_points binary-searches the timeline
        # assuming the tail sorts above every live time (a zero tail makes
        # searchsorted return `capacity` for every query, collapsing the
        # temporal window onto the newest nodes)
        times_pad = np.full((cap,), np.inf, np.float32)
        times_pad[:n] = times
        self.graph = g._replace(
            pos=jnp.asarray(pos_pad),
            times=jnp.asarray(times_pad),
            nbr=jnp.asarray(_neighbours(n, cap)),
            n_nodes=jnp.int32(n),
        )

    # -- constraints ---------------------------------------------------------
    def add_constraint(self, src, target, src_time, target_time,
                       pin: bool = False, relative: bool = False) -> None:
        self.constraints.append(
            HostConstraint(src, target, src_time, target_time, relative)
        )
        if pin:
            self.constraints.append(
                HostConstraint(target, target, target_time, target_time,
                               False, pin=True)
            )

    # -- the big one ---------------------------------------------------------
    def constrain(
        self,
        fern_poses: List[Tuple[int, np.ndarray]],   # [(srcTime, T_wc)]
        time: int,
        fern_match: bool,
        pose_history: List[Tuple[int, np.ndarray]],
        relax_graph: bool = False,
        collect_relative: bool = False,
    ):
        """Deformation::constrain (Deformation.cpp:88-207).  Returns
        (accepted, new fern poses, new pose history, relative constraints)
        — the graph itself stays in self.graph for clean() to apply."""
        self._materialize()
        if self.graph is None or not self.constraints:
            self.constraints.clear()
            return False, fern_poses, pose_history, []

        g = self.graph
        cons = self.constraints
        NC = self.constraint_capacity
        if len(cons) > NC:
            cons = cons[:NC]

        # point pool: src (+ target for relative) of each constraint
        src_pts = np.array([c.src for c in cons], np.float64)
        src_times = np.array([c.src_time for c in cons], np.float64)
        tar_pts = np.array([c.target for c in cons], np.float64)
        tar_times = np.array([c.target_time for c in cons], np.float64)
        rel = np.array([c.relative for c in cons], bool)

        src_nodes, src_w = weight_points(
            jnp.asarray(src_pts, jnp.float32), jnp.asarray(src_times, jnp.float32), g
        )
        tar_nodes, tar_w = weight_points(
            jnp.asarray(tar_pts, jnp.float32), jnp.asarray(tar_times, jnp.float32), g
        )
        nc = len(cons)
        pad = NC - nc

        def padv(a, fill=0.0):
            a = jnp.asarray(a, jnp.float32)
            return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                           constant_values=fill)

        cset = ConstraintSet(
            src=padv(src_pts),
            src_nodes=jnp.pad(src_nodes, ((0, pad), (0, 0))),
            src_w=padv(src_w),
            target=padv(tar_pts),
            tar_nodes=jnp.pad(tar_nodes, ((0, pad), (0, 0))),
            tar_w=padv(tar_w),
            relative=jnp.pad(jnp.asarray(rel), (0, pad)),
            valid=jnp.pad(jnp.ones(nc, bool), (0, pad)),
        )

        # enabled = nodes newer than lastDeformTime (0 for fern/relax)
        last_t = 0 if (fern_match or relax_graph) else self.last_deform_time
        enabled = (g.times > last_t) & (
            jnp.arange(self.node_capacity) < g.n_nodes
        )
        nbr = g.nbr

        # fern early-out (DeformationGraph.cpp:427-430)
        mean_cons = self._mean_cons_error(g, cset, nc)
        if fern_match and mean_cons < 0.06:
            self.constraints.clear()
            return False, fern_poses, pose_history, []

        # <= 3 GN iterations with the reference's convergence gates (cpp:460-476)
        NN = self.node_capacity
        x = jnp.concatenate([g.R.reshape(-1), g.t.reshape(-1)])
        last_error = None
        for it in range(1, 4):
            delta, err = _gn_step(x, g, nbr, enabled, cset)
            err = float(err)
            if it == 1:
                last_error = err
                if fern_match and err > 10.0:
                    x = x + delta
                    break
            x = x + delta
            new_err = float(jnp.sum(jnp.square(
                _flat_residual(x, g, nbr, enabled, cset))))
            dn = float(jnp.linalg.norm(delta))
            if (new_err > last_error or dn < 1e-2 or new_err < 1e-3
                    or abs(new_err - last_error) < 1e-5 * new_err):
                last_error = new_err
                break
            last_error = new_err

        g_opt = g._replace(
            R=x[: NN * 9].reshape(NN, 3, 3), t=x[NN * 9 :].reshape(NN, 3)
        )
        final_error = last_error
        mean_cons = self._mean_cons_error(g_opt, cset, nc)

        accept = (not fern_match) or (mean_cons < 0.0003 and final_error < 0.12)
        new_rel: List[HostConstraint] = []
        if accept:
            self.graph = g_opt
            fern_poses = self._apply_to_poses(fern_poses, g_opt)
            if fern_match:
                pose_history = self._apply_to_poses(pose_history, g_opt)
            if collect_relative and not fern_match:
                src_def = np.asarray(
                    blend_points(jnp.asarray(src_pts, jnp.float32),
                                 src_nodes, src_w, g_opt)
                )
                for i, c in enumerate(cons):
                    if not c.relative and not c.pin:
                        new_rel.append(HostConstraint(
                            src_def[i], c.target, c.src_time, c.target_time,
                            relative=True,
                        ))
            if not fern_match and not relax_graph:
                self.last_deform_time = time
            self.deforms += 1
        self.constraints.clear()
        return accept, fern_poses, pose_history, new_rel

    def _mean_cons_error(self, g: GraphState, cset: ConstraintSet, nc: int) -> float:
        """nonRelativeConstraintError (DeformationGraph.cpp:944-956)."""
        phi = blend_points(cset.src, cset.src_nodes, cset.src_w, g)
        err = jnp.linalg.norm(phi - cset.target, axis=1)
        mask = cset.valid & ~cset.relative
        # reference divides by ALL constraints, not just non-relative ones
        return float(jnp.sum(jnp.where(mask, err, 0.0)) / max(nc, 1))

    def _apply_to_poses(self, poses, g: GraphState):
        """applyGraphToPoses (DeformationGraph.cpp:98-126): blended translation
        + weight-blended rotation, SVD re-orthonormalized."""
        if not poses:
            return poses
        times = np.array([p[0] for p in poses], np.float64)
        trans = np.array([np.asarray(p[1])[:3, 3] for p in poses], np.float64)
        nodes, w = weight_points(
            jnp.asarray(trans, jnp.float32), jnp.asarray(times, jnp.float32), g
        )
        new_t = np.asarray(blend_points(jnp.asarray(trans, jnp.float32), nodes, w, g))
        Rblend = np.asarray(jnp.sum(
            w[..., None, None] * g.R[nodes], axis=1
        ))
        out = []
        for i, (ts, T) in enumerate(poses):
            newR = Rblend[i] @ np.asarray(T)[:3, :3]
            U, _, Vt = np.linalg.svd(newR)
            T2 = np.asarray(T).copy()
            T2[:3, :3] = U @ Vt
            T2[:3, 3] = new_t[i]
            out.append((ts, T2))
        return out
