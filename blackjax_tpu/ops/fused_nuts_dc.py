"""The continuous NUTS machine as ONE Pallas kernel, TRANSPOSED layout:
``(dim, chains)`` tiles — dims on sublanes, chains on lanes.

Why a second layout. The original kernel (:mod:`fused_nuts`) puts chains
on sublanes and dims on lanes, so every per-chain scalar is a ``(tc, 1)``
column and every select/broadcast against the ``(tc, d_pad)`` state pays
an MXU outer product ("Mosaic has no lane-broadcast relayout for columns
not born from a lane reduction") — ~25 serialized MXU ops per machine
iteration, measured at ~60% of the iteration cost. Transposing the tile
makes every per-chain scalar a ``(1, T)`` ROW: rows broadcast across
sublanes natively (a cheap in-register relayout Mosaic fully supports),
per-chain reductions are axis-0 sums that *produce* rows, and the history
write needs no MXU transpose because tracked coordinates are sublane
slices that already are rows. The machine semantics are identical; only
the data layout changed.

Semantics: the flattened lockstep machine of
:func:`blackjax_tpu.mcmc.trajectory.flattened_nuts_machine` (one leapfrog
per iteration, branch-free subtree bookkeeping, checkpointed U-turn
slots, biased trajectory merge) with the inline restart of the continuous
runner — one transition ends, the next begins on the following iteration.
Reference semantics: ``/root/reference/blackjax/mcmc/trajectory.py``
242-372 (dynamic progressive expansion) re-expressed leaf-at-a-time; see
``mcmc/trajectory.py`` in this repo for the XLA engine it must match.

Equivalence: DOCUMENTED equivalence, not bit-identity — randomness is
in-kernel counter-based threefry2x32 keyed on (seed, dim, chain, step,
depth/leaf, stream), a different stream from JAX's host PRNG. Tests
compare acceptance, trajectory-length distribution, moments and ESS
against the XLA path on identical configurations (same protocol as
``tests/ops/test_fused_nuts.py``).
"""
import functools
import os
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blackjax_tpu.ops.fused_leapfrog import _round_up
from blackjax_tpu.ops.fused_mclmc import _threefry2x32
from blackjax_tpu.ops.fused_nuts import _counter_uniforms, _popcount8


def _counter_uniforms2(seed, c0, tag, sub):
    """TWO independent U[0,1) per element from ONE threefry block —
    ``_counter_uniforms`` discards the second 32-bit stream; at ~110
    vector ops per threefry the pairing halves the per-leaf row-RNG cost
    for draws that share a (counter, sub) key."""
    b1, b2 = _threefry2x32(
        seed.astype(jnp.uint32),
        jnp.uint32(0x9E3779B9),
        c0.astype(jnp.uint32),
        (jnp.uint32(tag) << jnp.uint32(24)) | sub.astype(jnp.uint32),
    )
    u1 = (b1 >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * (2.0**-24)
    u2 = (b2 >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * (2.0**-24)
    return u1, u2

__all__ = [
    "TargetKernelDC",
    "fused_nuts_run_dc",
    "make_gaussian_target_dc",
    "make_hierarchical_target_dc",
]

_LANE = 128
_SUBLANE = 8


@dataclass(frozen=True, eq=False)
class TargetKernelDC:
    """An analytic target in the transposed ``(dim, chains)`` convention.

    ``logdensity_tile(x, mask, *params) -> (1, T)`` and
    ``grad_tile(x, mask, *params) -> (D, T)`` operate on a padded
    ``(d_padded, tile_chains)`` block; both must ignore sublanes where
    ``mask == 0`` and return zero gradient there.

    ``params`` entries are either

    - 1-D host vectors (any length ``L``): delivered zero-padded to the
      sublane boundary and lane-broadcast as ``(L_pad, T)`` VMEM operands, or
    - 2-D host matrices: delivered VERBATIM as whole-array VMEM operands
      replicated across chain tiles — the target pre-pads them to whatever
      geometry its tile contractions need (row counts should be multiples
      of 8; a contracting axis must exactly match its partner's).

    ``vg_tile``, when provided, computes ``(logdensity (1, T), grad (D, T))``
    in one pass so shared intermediates (the MXU contractions of the
    matmul-class targets) are evaluated once per leapfrog instead of twice.
    """

    name: str
    dim: int
    logdensity_tile: Callable
    grad_tile: Callable
    logdensity_fn: Callable
    params: tuple = ()
    vg_tile: Callable = None

    def __hash__(self):  # ride through jit as a static argument
        # params may hold ndarrays; name+dim is enough (distinct instances
        # that collide merely re-specialize, they never alias). Equality
        # stays IDENTITY (eq=False): rebuilding a semantically identical
        # target per call (same data, fresh instance) retraces under jit
        # every time and grows the trace cache unboundedly — build the
        # target ONCE and reuse it across calls (as the registry factories
        # below and benchmarks/tracked.py do).
        return hash((self.name, self.dim))


def make_gaussian_target_dc(dim: int, variances=None) -> TargetKernelDC:
    """Independent Gaussian ``N(0, diag(variances))``, transposed tiles."""
    import numpy as np

    if variances is None:
        inv_var_host = np.ones(dim, np.float32)
    else:
        inv_var_host = 1.0 / np.asarray(variances, np.float32)
    inv_var_param = tuple(float(v) for v in inv_var_host)

    def logdensity_tile(x, mask, inv_var):
        return -0.5 * jnp.sum(x * x * inv_var * mask, axis=0, keepdims=True)

    def grad_tile(x, mask, inv_var):
        return -x * inv_var * mask

    def logdensity_fn(x):
        return -0.5 * jnp.sum(x**2 * jnp.asarray(inv_var_host), axis=-1)

    return TargetKernelDC(
        name="gaussian_dc",
        dim=dim,
        logdensity_tile=logdensity_tile,
        grad_tile=grad_tile,
        logdensity_fn=logdensity_fn,
        params=(inv_var_param,),
    )


def make_hierarchical_target_dc(dim: int) -> TargetKernelDC:
    """The flagship hierarchical Gaussian, transposed tiles. Unlike the
    ``(chains, dim)`` twin (``make_mxu_safe_hierarchical_target``) there is
    nothing to work around: ``log_tau`` is the sublane-0 slice — already a
    row — and the row-broadcast of ``exp(-log_tau)`` over the gradient is
    native."""
    n_theta = dim - 1

    def _masks(x, mask):
        rowid = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        is_tau = (rowid == 0).astype(x.dtype) * mask
        theta_mask = mask * (rowid > 0).astype(x.dtype)
        return is_tau, theta_mask

    def logdensity_tile(x, mask):
        is_tau, theta_mask = _masks(x, mask)
        log_tau = jnp.sum(x * is_tau, axis=0, keepdims=True)  # (1, T)
        theta_sq = jnp.sum((x * theta_mask) ** 2, axis=0, keepdims=True)
        return (
            -0.5 * log_tau**2
            - 0.5 * theta_sq * jnp.exp(-log_tau)
            - 0.5 * n_theta * log_tau
        )

    def grad_tile(x, mask):
        is_tau, theta_mask = _masks(x, mask)
        log_tau = jnp.sum(x * is_tau, axis=0, keepdims=True)
        exp_neg = jnp.exp(-log_tau)  # (1, T) row; broadcasts natively
        theta_sq = jnp.sum((x * theta_mask) ** 2, axis=0, keepdims=True)
        g_tau = -log_tau + 0.5 * theta_sq * exp_neg - 0.5 * n_theta
        return is_tau * g_tau - (x * theta_mask) * exp_neg

    def logdensity_fn(x):
        log_tau = x[..., 0]
        theta = x[..., 1:]
        return (
            -0.5 * log_tau**2
            - 0.5 * jnp.sum(theta**2, axis=-1) * jnp.exp(-log_tau)
            - 0.5 * n_theta * log_tau
        )

    return TargetKernelDC(
        name="hierarchical_gaussian_dc",
        dim=dim,
        logdensity_tile=logdensity_tile,
        grad_tile=grad_tile,
        logdensity_fn=logdensity_fn,
    )


def _nuts_kernel_dc(
    *refs,
    grad_tile,
    logdensity_tile,
    vg_tile,
    num_steps,
    budget,
    chunk,
    max_depth,
    d,
    d_pad,
    n_params,
    n_track,
    divergence_threshold,
    metric_kind="diag",
    n_metric=2,
    pack=1,
    restart_every=1,
    track_rows=None,
    disable=(),
):
    if track_rows is None:
        track_rows = tuple(range(n_track))
    scalars = refs[0]  # SMEM (1,) f32: step_size
    seed_ref = refs[1]  # SMEM (1,) int32
    x_ref = refs[2]
    metric_refs = refs[3 : 3 + n_metric]
    param_refs = refs[3 + n_metric : 3 + n_metric + n_params]
    out_refs = refs[3 + n_metric + n_params :]
    xacc_ref, steps_ref, grads_ref = out_refs[:3]
    hist_refs = out_refs[3:]

    eps = scalars[0]
    seed = seed_ref[0]
    # slot packing: each LANE owns `pack` logical chains, run sequentially.
    # The x/out blocks are (rows, pack * T); chain k of lane j sits at
    # column k * T + j, so the global column numbering — and with it every
    # per-chain counter-based RNG stream — is identical to the unpacked
    # kernel's. A lane that finishes its transitions PARKS (done, inactive)
    # until the chunk boundary, where the switch block flushes its outputs
    # into chain-block k's columns and loads chain k+1: zero per-leaf cost,
    # and the lockstep straggler tail is averaged over `pack` chains/lane.
    D, TT = x_ref.shape
    T = TT // pack
    S = num_steps

    rowid = jax.lax.broadcasted_iota(jnp.int32, (D, T), 0)
    mask = (rowid < d).astype(jnp.float32)  # (D, T) dim mask
    params = tuple(p[:] for p in param_refs)

    def _mm(a, b, ca, cb):
        return jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((ca,), (cb,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # ---- metric: M^{-1} matvec + momentum sampling, three spellings ------
    # diag keeps the original zero-extra-carry form; dense/low-rank carry
    # the w = M^{-1} m companions of every stored momentum so the turning
    # checks stay dot products (no matmul per checkpoint slot per leaf)
    if metric_kind == "diag":
        imm = metric_refs[0][:] * mask  # zero pad sublanes kill pad traffic
        sigma_m = metric_refs[1][:] * mask
        imm_mv = lambda m: imm * m
        sample_m = lambda z: sigma_m * z
    elif metric_kind == "dense":
        imm_mat = metric_refs[0][:]  # (D, D), zero-padded beyond d
        chol_mass = metric_refs[1][:]  # C with C C^T = M, zero-padded
        imm_mv = lambda m: _mm(imm_mat, m, 1, 0)
        sample_m = lambda z: _mm(chol_mass, z, 1, 0)
    elif metric_kind == "low_rank":
        # M^{-1} = D (I + U (Lam - I) U^T) D  (metrics.py:93-128), O(dk)
        sigma_v = metric_refs[0][:] * mask
        inv_sigma_v = metric_refs[1][:] * mask
        U_op = metric_refs[2][:]  # (D, k_pad), zero-padded
        lam_m1 = metric_refs[3][:]  # (k_pad, T) lane-broadcast Lam - 1
        isl_m1 = metric_refs[4][:]  # (k_pad, T) 1/sqrt(Lam) - 1

        def _lrmv(y, s_m1):
            t = _mm(U_op, y, 0, 0)  # (k_pad, T)
            return y + _mm(U_op, s_m1 * t, 1, 0)

        imm_mv = lambda m: sigma_v * _lrmv(sigma_v * m, lam_m1)
        # m = M^{1/2} z = D^{-1} B z with B = I + U(Lam^{-1/2} - I)U^T
        sample_m = lambda z: inv_sigma_v * _lrmv(z, isl_m1)
    else:  # pragma: no cover - guarded by the runner
        raise ValueError(f"unknown metric_kind {metric_kind!r}")
    carry_w = metric_kind != "diag"

    # lane-replicated global chain ids: grid column base + the lane's
    # CURRENT logical chain block (cur * T) + lane. Recomputed per leaf
    # from the carried `cur` row (two row ops); for pack == 1 this is the
    # same constant the unpacked kernel used.
    col_base = pl.program_id(0) * TT
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)

    def chain_id_row(cur):
        return col_base + cur * T + lane_row

    srow = jax.lax.broadcasted_iota(jnp.int32, (S, T), 0)  # history row ids

    def dot_d(a, b):
        return jnp.sum(a * b, axis=0, keepdims=True)  # (1, T)

    def turning_w(w_left, w_right, m_left, m_right, m_sum):
        """Generalized U-turn on precomputed w = M^{-1} m companions."""
        rho = m_sum - 0.5 * (m_left + m_right)
        return (dot_d(w_left, rho) <= 0.0) | (dot_d(w_right, rho) <= 0.0)

    # rows broadcast across sublanes natively: select IS jnp.where
    sel = jnp.where

    def f01(pred):
        return jnp.where(pred, jnp.float32(1), jnp.float32(0))

    def ld_row(x):
        ld = logdensity_tile(x, mask, *params)
        return ld if ld.ndim == 2 else ld[None, :]

    def value_and_grad(x):
        """(logdensity (1, T), grad (D, T)) — one pass when the target
        provides a fused tile (shares the MXU contractions of the
        matmul-class targets between value and gradient)."""
        if vg_tile is not None:
            ld, g = vg_tile(x, mask, *params)
            return (ld if ld.ndim == 2 else ld[None, :]), g
        return ld_row(x), grad_tile(x, mask, *params)

    # ---- initial chain state (each lane starts on its chain block 0) ----
    x0 = x_ref[:, :T]
    ld0, g0 = value_and_grad(x0)

    zero_v = jnp.zeros((D, T), jnp.float32)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    zero_i = row_iota * 0
    zero_s = row_iota.astype(jnp.float32) * 0.0
    fbool = row_iota < 0
    neg_inf_row = zero_s - jnp.inf

    state0 = dict(
        acc_x=x0, acc_g=g0, acc_ld=ld0,
        cur=zero_i,  # which of the lane's `pack` logical chains is live
        steps=zero_i,
        done=zero_s + 1.0,  # f32 flag: forces a start on iteration 0
        cur_x=x0, cur_m=zero_v, cur_g=g0, cur_ld=ld0,
        left_x=x0, left_m=zero_v, left_g=g0, left_ld=ld0,
        right_x=x0, right_m=zero_v, right_g=g0, right_ld=ld0,
        msum=zero_v, sub_msum=zero_v,
        prop_x=x0, prop_g=g0, prop_ld=ld0,
        prop_w=zero_s, prop_slpa=zero_s,
        sub_x=x0, sub_g=g0, sub_ld=ld0,
        sub_w=zero_s, sub_slpa=zero_s,
        h0=zero_s,
        direction=zero_s + 1.0,
        depth=zero_i, leaf=zero_i, nstates=zero_i,
        div=zero_s, turn=zero_s,
        grads=zero_s,  # per-chain grad-eval counts (summed outside)
        hist=tuple(jnp.zeros((S, T), jnp.float32) for _ in range(n_track)),
    )
    # checkpoint slots as SEPARATE carry entries: stacking them into one
    # 3-D array per iteration (the cd kernel's choice) copies every slot
    # every leaf
    for i in range(max_depth):
        state0[f"ckpt_m{i}"] = zero_v
        state0[f"ckpt_s{i}"] = zero_v
        if carry_w:
            state0[f"ckpt_w{i}"] = zero_v
    if carry_w:
        # w = M^{-1} m companions of the trajectory endpoints (diag
        # recomputes them as imm * m — cheaper than carrying)
        state0["left_w"] = zero_v
        state0["right_w"] = zero_v
    keys = list(state0.keys())

    def pending_hist_write(hist_tuple, done_bool, steps, acc_x):
        """Deferred history write: a closed transition's accepted sample
        persists in ``acc_x`` (the lane PARKS until the next gated leaf),
        so the (S, T)-masked history write runs only on gated leaves, at
        chain switches and at the epilogue — 1/restart_every of the old
        per-leaf cost. Idempotent for lanes that stay parked."""
        if "hist" in disable:
            return hist_tuple
        write_row = (srow == steps - 1) & done_bool & (steps >= 1)
        return tuple(
            jnp.where(write_row, acc_x[r : r + 1, :], hist_tuple[k])
            for k, r in enumerate(track_rows)
        )

    def leaf_step(_, carry, with_restart=True):
        s = dict(zip(keys, carry))
        # boolean flags ride the carry as f32 0/1 (i1 vector loop carries
        # fail scf.for legalization); local views are bool
        s["done"] = s["done"] > 0.5
        s["div"] = s["div"] > 0.5
        s["turn"] = s["turn"] > 0.5
        live = s["steps"] < S

        chain_row = chain_id_row(s["cur"])
        base_row = chain_row * S + s["steps"]  # (1, T) per-(chain, step) id

        # ---- inline restart: chains that closed start the next one ----
        # Gated statically to every `restart_every`-th leaf: the momentum
        # draw is keyed on (chain, step) — independent of WHICH leaf
        # computes it — so delaying a restart changes scheduling only
        # (chains park <= restart_every - 1 leaves); outputs are bitwise
        # identical, and the gated leaves drop the entire threefry +
        # Box-Muller + refresh block (~half the per-leaf vector ops).
        if with_restart:
            s["hist"] = pending_hist_write(
                s["hist"], s["done"], s["steps"], s["acc_x"]
            )
            start = s["done"] & live
            if "rng" in disable:  # attribution only: NOT a valid sampler
                z = mask * jnp.cos(s["steps"].astype(jnp.float32))
            else:
                base_full = base_row  # row broadcast against rowid: native
                b1, b2 = _threefry2x32(
                    jnp.uint32(seed),
                    jnp.uint32(0x9E3779B9),
                    rowid.astype(jnp.uint32),
                    (jnp.uint32(1) << jnp.uint32(24)) | base_full.astype(jnp.uint32),
                )
                u1 = (
                    (b1 >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) + 1.0
                ) * (2.0**-24)
                u2 = (b2 >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * (
                    2.0**-24
                )
                z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(6.283185307179586 * u2)
            fresh_m = sample_m(z)

            w_fresh = imm_mv(fresh_m)
            h0_new = -s["acc_ld"] + 0.5 * dot_d(w_fresh, fresh_m)
            refresh = [
                ("cur_x", s["acc_x"]), ("cur_m", fresh_m), ("cur_g", s["acc_g"]),
                ("cur_ld", s["acc_ld"]),
                ("left_x", s["acc_x"]), ("left_m", fresh_m), ("left_g", s["acc_g"]),
                ("left_ld", s["acc_ld"]),
                ("right_x", s["acc_x"]), ("right_m", fresh_m), ("right_g", s["acc_g"]),
                ("right_ld", s["acc_ld"]),
                ("msum", fresh_m), ("sub_msum", zero_v),
                ("prop_x", s["acc_x"]), ("prop_g", s["acc_g"]), ("prop_ld", s["acc_ld"]),
                ("sub_x", s["acc_x"]), ("sub_g", s["acc_g"]), ("sub_ld", s["acc_ld"]),
            ]
            if carry_w:
                refresh += [("left_w", w_fresh), ("right_w", w_fresh)]
            for name, fresh in refresh:
                s[name] = sel(start, fresh, s[name])
            for name, fresh in [
                ("prop_w", zero_s), ("prop_slpa", neg_inf_row),
                ("sub_w", zero_s), ("sub_slpa", neg_inf_row),
                ("h0", h0_new),
            ]:
                s[name] = sel(start, fresh, s[name])
            for name in ["depth", "leaf", "nstates"]:
                s[name] = sel(start, zero_i, s[name])
            s["div"] = s["div"] & ~start
            s["turn"] = s["turn"] & ~start
            s["done"] = s["done"] & ~start

        active = ~s["done"] & live

        # ---- subtree start: direction draw, register reset -------------
        # u_dir and the trajectory-merge u_prop share one threefry block
        # (both keyed on (chain, step, depth)): halves the row-RNG cost
        at_start = (s["leaf"] == 0) & active
        u_dir, u_prop = _counter_uniforms2(seed, base_row, 2, s["depth"])
        new_dir = jnp.where(u_dir < 0.5, -1.0, 1.0)
        direction = sel(at_start, new_dir, s["direction"])
        fwd = direction > 0.0
        cur_x = sel(at_start, sel(fwd, s["right_x"], s["left_x"]), s["cur_x"])
        cur_m = sel(at_start, sel(fwd, s["right_m"], s["left_m"]), s["cur_m"])
        cur_g = sel(at_start, sel(fwd, s["right_g"], s["left_g"]), s["cur_g"])

        # ---- one leapfrog (velocity verlet, diag metric) ---------------
        d_eps = direction * eps  # (1, T) row; broadcasts natively
        m_half = cur_m + 0.5 * d_eps * cur_g
        new_x = cur_x + d_eps * imm_mv(m_half)
        new_ld, new_g = value_and_grad(new_x)
        new_m = m_half + 0.5 * d_eps * new_g

        # w_new = M^{-1} new_m: the kinetic energy, the right side of every
        # checkpoint turning check, and (dense/low-rank) the stored endpoint
        # companions all share this one application
        w_new = imm_mv(new_m)
        energy = -new_ld + 0.5 * dot_d(w_new, new_m)
        delta = s["h0"] - energy
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        leaf_w = delta
        leaf_slpa = jnp.minimum(delta, 0.0)
        leaf_div = (-delta > divergence_threshold) & active

        # ---- subtree progressive (uniform) sampling --------------------
        u_leaf = _counter_uniforms(seed, base_row, 3, s["nstates"])
        p_acc = jax.nn.sigmoid(leaf_w - s["sub_w"])
        take = (u_leaf < p_acc) & active
        merged_w = jnp.logaddexp(s["sub_w"], leaf_w)
        merged_slpa = jnp.logaddexp(s["sub_slpa"], leaf_slpa)
        sub_x = sel(at_start, new_x, sel(take, new_x, s["sub_x"]))
        sub_g = sel(at_start, new_g, sel(take, new_g, s["sub_g"]))
        sub_ld = sel(at_start, new_ld, sel(take, new_ld, s["sub_ld"]))
        sub_w = sel(at_start, leaf_w, merged_w)
        sub_slpa = sel(at_start, leaf_slpa, merged_slpa)
        sub_msum = sel(at_start, new_m, s["sub_msum"] + new_m)

        # ---- checkpoint slots ------------------------------------------
        leaf_i = s["leaf"]
        idx_max = _popcount8(leaf_i >> 1)
        low_zero_mask = ((~leaf_i) & (leaf_i + 1)) - 1
        idx_min = idx_max - _popcount8(low_zero_mask) + 1
        is_even = (leaf_i % 2) == 0

        # the turning check against slot i uses
        #   rho_i = (sub_msum - cks_i + ckm_i) - 0.5 * (ckm_i + new_m)
        #         = rho_base - cks_i + 0.5 * ckm_i
        # with rho_base = sub_msum - 0.5 * new_m shared by every slot, and
        # the right-momentum factor imm * new_m shared too — hoisting both
        # cuts the slot loop from ~8 to ~5 vector ops per slot
        rho_base = sub_msum - 0.5 * new_m
        subtree_turning = fbool
        for i in range(0 if "ckpt" in disable else max_depth):
            w_i = is_even & (idx_max == i) & active  # (1, T)
            ckm = sel(w_i, new_m, s[f"ckpt_m{i}"])
            cks = sel(w_i, sub_msum, s[f"ckpt_s{i}"])
            if carry_w:  # slot's M^{-1} m, written once at slot-write time
                ckw = sel(w_i, w_new, s[f"ckpt_w{i}"])
                s[f"ckpt_w{i}"] = ckw
            else:
                ckw = imm * ckm
            chk = (i >= idx_min) & (i <= idx_max) & ~is_even
            rho = rho_base - cks + 0.5 * ckm
            slot_turn = (dot_d(ckw, rho) <= 0.0) | (
                dot_d(w_new, rho) <= 0.0
            )
            subtree_turning = subtree_turning | (chk & slot_turn)
            s[f"ckpt_m{i}"] = ckm
            s[f"ckpt_s{i}"] = cks
        subtree_turning = subtree_turning & active

        # ---- subtree boundary ------------------------------------------
        leaf_next = leaf_i + 1
        subtree_complete = leaf_next >= (1 << s["depth"])
        aborted = leaf_div | subtree_turning
        closing = (subtree_complete | aborted) & active

        msum = sel(closing, s["msum"] + sub_msum, s["msum"])
        left_x = sel(closing & ~fwd, new_x, s["left_x"])
        left_m = sel(closing & ~fwd, new_m, s["left_m"])
        left_g = sel(closing & ~fwd, new_g, s["left_g"])
        left_ld = sel(closing & ~fwd, new_ld, s["left_ld"])
        right_x = sel(closing & fwd, new_x, s["right_x"])
        right_m = sel(closing & fwd, new_m, s["right_m"])
        right_g = sel(closing & fwd, new_g, s["right_g"])
        right_ld = sel(closing & fwd, new_ld, s["right_ld"])
        if carry_w:
            left_w = sel(closing & ~fwd, w_new, s["left_w"])
            right_w = sel(closing & fwd, w_new, s["right_w"])
            s["left_w"], s["right_w"] = left_w, right_w
        else:
            left_w, right_w = imm * left_m, imm * right_m

        # trajectory-level proposal merge (biased toward the new subtree);
        # an aborted subtree contributes acceptance statistics only
        p_biased = jnp.minimum(jnp.exp(sub_w - s["prop_w"]), 1.0)
        take_traj = (u_prop < p_biased) & closing & ~aborted
        merged_pw = jnp.logaddexp(s["prop_w"], sub_w)
        merged_pslpa = jnp.logaddexp(s["prop_slpa"], sub_slpa)
        prop_x = sel(take_traj, sub_x, s["prop_x"])
        prop_g = sel(take_traj, sub_g, s["prop_g"])
        prop_ld = sel(take_traj, sub_ld, s["prop_ld"])
        prop_w = sel(closing, sel(aborted, s["prop_w"], merged_pw), s["prop_w"])
        prop_slpa = sel(closing, merged_pslpa, s["prop_slpa"])

        full_turn = closing & turning_w(left_w, right_w, left_m, right_m, msum)

        depth = sel(closing, s["depth"] + 1, s["depth"])
        leaf_out = sel(closing, zero_i, leaf_next)
        div = s["div"] | leaf_div
        turn = s["turn"] | (closing & (subtree_turning | full_turn))
        done_new = div | turn | (closing & (depth >= max_depth))
        nstates = sel(active, s["nstates"] + 1, s["nstates"])

        # ---- transition close ------------------------------------------
        just_closed = active & done_new
        s["grads"] = s["grads"] + jnp.where(
            just_closed, nstates.astype(jnp.float32), 0.0
        )
        steps = sel(just_closed, s["steps"] + 1, s["steps"])
        acc_x = sel(just_closed, prop_x, s["acc_x"])
        acc_g = sel(just_closed, prop_g, s["acc_g"])
        acc_ld = sel(just_closed, prop_ld, s["acc_ld"])

        s.update(
            cur_x=new_x, cur_m=new_m, cur_g=new_g, cur_ld=new_ld,
            left_x=left_x, left_m=left_m, left_g=left_g, left_ld=left_ld,
            right_x=right_x, right_m=right_m, right_g=right_g, right_ld=right_ld,
            msum=msum, sub_msum=sub_msum,
            prop_x=prop_x, prop_g=prop_g, prop_ld=prop_ld,
            prop_w=prop_w, prop_slpa=prop_slpa,
            sub_x=sub_x, sub_g=sub_g, sub_ld=sub_ld,
            sub_w=sub_w, sub_slpa=sub_slpa,
            direction=direction, depth=depth, leaf=leaf_out, nstates=nstates,
            div=f01(div), turn=f01(turn),
            done=f01(done_new | s["done"]),
            steps=steps, acc_x=acc_x, acc_g=acc_g, acc_ld=acc_ld,
        )
        return tuple(s[k] for k in keys)

    i_cur, i_steps = keys.index("cur"), keys.index("steps")

    def flush(k_blk, lane_mask, s):
        """Write chain block ``k_blk``'s output columns for ``lane_mask``
        lanes (read-modify-write: other lanes' columns are preserved). At
        a switch ``steps == S`` so every history row is live; the epilogue
        handles partial chains separately."""
        c0, c1 = k_blk * T, (k_blk + 1) * T
        xacc_ref[:, c0:c1] = jnp.where(
            lane_mask, s["acc_x"], xacc_ref[:, c0:c1]
        )
        steps_ref[:, c0:c1] = jnp.where(
            lane_mask, s["steps"], steps_ref[:, c0:c1]
        )
        grads_ref[:, c0:c1] = jnp.where(
            lane_mask, s["grads"], grads_ref[:, c0:c1]
        )
        for t in range(n_track):
            hist_refs[t][:, c0:c1] = jnp.where(
                lane_mask, s["hist"][t], hist_refs[t][:, c0:c1]
            )

    def switch_block(carry):
        """Chunk-boundary chain switch: lanes parked on a finished chain
        flush its outputs and load their next logical chain. Runs once per
        chunk — the leaf loop itself carries zero packing overhead."""
        s = dict(zip(keys, carry))
        s["hist"] = pending_hist_write(
            s["hist"], s["done"] > 0.5, s["steps"], s["acc_x"]
        )
        switching = (s["steps"] >= S) & (s["cur"] < pack - 1)
        for kb in range(pack - 1):
            flush(kb, switching & (s["cur"] == kb), s)
        nxt = s["acc_x"]
        for kb in range(1, pack):
            arriving = switching & (s["cur"] + 1 == kb)
            nxt = jnp.where(arriving, x_ref[:, kb * T : (kb + 1) * T], nxt)
        ld_n, g_n = value_and_grad(nxt)
        s["acc_x"] = nxt
        s["acc_g"] = jnp.where(switching, g_n, s["acc_g"])
        s["acc_ld"] = jnp.where(switching, ld_n, s["acc_ld"])
        s["steps"] = jnp.where(switching, 0, s["steps"])
        s["grads"] = jnp.where(switching, 0.0, s["grads"])
        s["cur"] = s["cur"] + switching.astype(jnp.int32)
        s["done"] = jnp.where(switching, 1.0, s["done"])
        return tuple(s[k] for k in keys)

    if "exit" in disable:
        carry = jax.lax.fori_loop(
            0, budget, leaf_step, tuple(state0[k] for k in keys)
        )
    else:
        end = pack * S

        if restart_every == 1:
            inner_body = leaf_step
            n_inner = chunk
        else:

            def inner_body(j, carry):
                carry = leaf_step(j, carry, with_restart=True)
                for _ in range(restart_every - 1):
                    carry = leaf_step(j, carry, with_restart=False)
                return carry

            n_inner = chunk // restart_every

        def chunk_body(c, carry):
            # skip whole chunks once every lane finished all its chains
            progress = carry[i_cur] * S + carry[i_steps]
            carry = jax.lax.cond(
                jnp.min(progress) < end,
                lambda cr: jax.lax.fori_loop(0, n_inner, inner_body, cr),
                lambda cr: cr,
                carry,
            )
            if pack > 1:
                carry = switch_block(carry)
            return carry

        carry = jax.lax.fori_loop(
            0, budget // chunk, chunk_body, tuple(state0[k] for k in keys)
        )
    final = dict(zip(keys, carry))
    final["hist"] = pending_hist_write(
        final["hist"], final["done"] > 0.5, final["steps"], final["acc_x"]
    )

    if pack == 1:
        xacc_ref[:] = final["acc_x"]
        steps_ref[:] = final["steps"]
        grads_ref[:] = final["grads"]
        for k in range(n_track):
            hist_refs[k][:] = final["hist"][k]
    else:
        # epilogue per chain block: cur's partial state is written with
        # rows >= steps zeroed (the unpacked kernel's zero-init semantics);
        # never-reached blocks get (x0, 0, 0, zeros); already-flushed
        # blocks (cur > kb) are preserved (their columns were written at
        # the switch that left them)
        zero_row_i = jnp.zeros((1, T), jnp.int32)
        zero_row_f = jnp.zeros((1, T), jnp.float32)
        for kb in range(pack):
            c0, c1 = kb * T, (kb + 1) * T
            is_cur = final["cur"] == kb
            unreached = final["cur"] < kb
            xacc_ref[:, c0:c1] = jnp.where(
                is_cur,
                final["acc_x"],
                jnp.where(unreached, x_ref[:, c0:c1], xacc_ref[:, c0:c1]),
            )
            steps_ref[:, c0:c1] = jnp.where(
                is_cur,
                final["steps"],
                jnp.where(unreached, zero_row_i, steps_ref[:, c0:c1]),
            )
            grads_ref[:, c0:c1] = jnp.where(
                is_cur,
                final["grads"],
                jnp.where(unreached, zero_row_f, grads_ref[:, c0:c1]),
            )
            for t in range(n_track):
                live_rows = is_cur & (srow < final["steps"])
                hist_refs[t][:, c0:c1] = jnp.where(
                    live_rows,
                    final["hist"][t],
                    jnp.where(
                        is_cur | unreached, 0.0, hist_refs[t][:, c0:c1]
                    ),
                )


def fused_nuts_run_dc(
    positions,
    inverse_mass_matrix,
    step_size,
    *,
    target: TargetKernelDC,
    num_steps: int,
    max_num_doublings: int = 8,
    seed: int = 0,
    num_track: int = 8,
    track_rows: tuple = None,
    tile_chains: int = 128,
    budget: int = None,
    chunk: int = 128,
    pack: int = 1,
    restart_every: int = 1,
    divergence_threshold: float = 1000.0,
    interpret: bool = False,
    debug: bool = False,
):
    """Run ``num_steps`` NUTS transitions per chain entirely on-chip,
    transposed ``(dim, chains)`` tiles.

    Same contract as :func:`fused_nuts.fused_nuts_run`: ``positions`` is
    ``(C, d)`` f32; returns ``(final_positions (C, d), history
    (C, num_steps, num_track), total_grads, steps (C,))``.
    ``steps[c] < num_steps`` means the iteration ``budget`` ran out before
    chain ``c`` finished. History records coordinates ``0..num_track-1``
    by default; pass ``track_rows`` (a tuple of ``num_track`` static
    coordinate indices) to record an arbitrary subset — e.g. the
    slowest-mixing coordinates identified by a pilot run, so
    min-over-tracked ESS measures min-over-all (``benchmarks/tracked.py``
    horseshoe protocol).

    ``inverse_mass_matrix`` accepts the full adapted-metric family
    (reference ``blackjax/mcmc/metrics.py:180`` dispatch):

    - ``(d,)`` diagonal — the original zero-extra-carry path;
    - ``(d, d)`` dense — ``M^{-1}`` matvecs and the ``chol(M)`` momentum
      factor become ``(d, d) x (d, T)`` MXU contractions (2 per leapfrog);
      the U-turn checks stay dot products by carrying the ``w = M^{-1} m``
      companion of every stored momentum (endpoints + checkpoint slots);
    - :class:`~blackjax_tpu.mcmc.metrics.LowRankInverseMassMatrix` —
      ``M^{-1} = D(I + U(Lam-I)U^T)D`` in O(dk): two skinny ``(d, k)``
      contractions per matvec, same carried-``w`` scheme.

    ``pack`` > 1 runs ``pack`` logical chains per physical lane,
    sequentially, with chunk-boundary switching: the lockstep straggler
    tail (a tile only skips a chunk once EVERY lane is finished) is
    averaged over ``pack`` chains per lane instead of paid per chain.
    Per-chain RNG streams are keyed on the global chain id, so results
    are identical to ``pack=1`` for every chain. ``budget`` counts leaf
    iterations per LANE, covering all its ``pack`` chains.

    .. warning:: chain ids are KERNEL-LOCAL (derived from ``program_id``),
       so under ``shard_map`` every shard sees ids ``0..C_shard-1``: calling
       with the same ``seed`` on every shard silently duplicates chains
       across devices. Offset the seed per shard, e.g. ``seed + C_shard *
       jax.lax.axis_index('chains')`` — as ``tests/multidevice/
       test_pallas_shardmap.py`` and ``__graft_entry__.py`` do.
    """
    C, d = positions.shape
    if d != target.dim:
        raise ValueError(f"positions dim {d} != registered target dim {target.dim}")
    if num_track > d:
        raise ValueError(f"num_track={num_track} > dim {d}")
    if track_rows is not None:
        track_rows = tuple(int(r) for r in track_rows)
        if len(track_rows) != num_track:
            raise ValueError(
                f"track_rows has {len(track_rows)} entries, expected "
                f"num_track={num_track}"
            )
        if any(r < 0 or r >= d for r in track_rows):
            raise ValueError(f"track_rows out of range [0, {d}): {track_rows}")
    if pack < 1:
        raise ValueError(f"pack must be >= 1, got {pack}")
    if restart_every < 1 or chunk % restart_every != 0:
        raise ValueError(
            f"restart_every must be >= 1 and divide chunk, got "
            f"{restart_every} (chunk={chunk})"
        )
    d_pad = _round_up(d, _SUBLANE)
    tile_chains = max(_LANE, _round_up(min(tile_chains, max(C, 1)), _LANE))
    block_chains = tile_chains * pack
    c_pad = _round_up(C, block_chains)
    n_tiles = c_pad // block_chains
    if budget is None:
        budget = 32 * num_steps * pack
    budget = _round_up(budget, chunk)

    x = jnp.pad(
        positions.astype(jnp.float32).T, ((0, d_pad - d), (0, c_pad - C))
    )

    def _row_param(vec):
        """(d,) host vector -> (d_pad, T) lane-broadcast VMEM operand."""
        v = jnp.pad(jnp.asarray(vec, jnp.float32), (0, d_pad - len(vec)))
        return jnp.broadcast_to(v[:, None], (d_pad, tile_chains))

    # ---- metric operands: diag (d,), dense (d, d), or low-rank pytree ----
    from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix

    def _pad_mat(a, rows, cols):
        a = jnp.asarray(a, jnp.float32)
        return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))

    if isinstance(inverse_mass_matrix, LowRankInverseMassMatrix):
        metric_kind = "low_rank"
        sig = jnp.asarray(inverse_mass_matrix.sigma, jnp.float32)
        U = jnp.asarray(inverse_mass_matrix.U, jnp.float32)
        lam = jnp.asarray(inverse_mass_matrix.lam, jnp.float32)
        k = U.shape[1]
        k_pad = _round_up(max(k, 1), _SUBLANE)

        def _k_row(vec):  # (k,) -> (k_pad, T), zero-padded (pad cols of U
            # are zero, so a zero pad scale keeps the algebra exact)
            v = jnp.pad(vec, (0, k_pad - k))
            return jnp.broadcast_to(v[:, None], (k_pad, tile_chains))

        metric_ops = [
            _row_param(sig),
            _row_param(1.0 / sig),
            _pad_mat(U, d_pad, k_pad),
            _k_row(lam - 1.0),
            _k_row(1.0 / jnp.sqrt(lam) - 1.0),
        ]
    elif jnp.ndim(inverse_mass_matrix) == 2:
        metric_kind = "dense"
        imm_d = jnp.asarray(inverse_mass_matrix, jnp.float32)
        # C with C C^T = M (the momentum-sampling factor): M^{-1} = L L^T
        # => C = L^{-T} (metrics.py _sqrt_factors)
        L = jnp.linalg.cholesky(imm_d)
        chol_mass = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(d, dtype=jnp.float32), lower=True, trans=True
        )
        metric_ops = [
            _pad_mat(imm_d, d_pad, d_pad),
            _pad_mat(chol_mass, d_pad, d_pad),
        ]
    else:
        metric_kind = "diag"
        imm_vec = jnp.broadcast_to(
            jnp.asarray(inverse_mass_matrix, jnp.float32), (d,)
        )
        metric_ops = [
            _row_param(imm_vec),
            _row_param(
                jnp.sqrt(
                    jnp.where(
                        imm_vec > 0.0,
                        1.0 / jnp.where(imm_vec > 0.0, imm_vec, 1.0),
                        0.0,
                    )
                )
            ),
        ]

    def _prep_param(p):
        """1-D vectors: sublane-padded, lane-broadcast. 2-D matrices:
        verbatim (the target pre-pads), replicated across chain tiles."""
        a = jnp.asarray(p, jnp.float32)
        if a.ndim == 1:
            rows = _round_up(a.shape[0], _SUBLANE)
            v = jnp.pad(a, (0, rows - a.shape[0]))
            op = jnp.broadcast_to(v[:, None], (rows, tile_chains))
            spec = pl.BlockSpec(
                (rows, tile_chains), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
            return op, spec
        if a.ndim != 2:
            raise ValueError(f"target params must be 1-D or 2-D, got {a.ndim}-D")
        spec = pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        return a, spec

    prepped = [_prep_param(p) for p in target.params]
    padded_params = tuple(op for op, _ in prepped)
    param_specs = [spec for _, spec in prepped]

    kernel = functools.partial(
        _nuts_kernel_dc,
        grad_tile=target.grad_tile,
        logdensity_tile=target.logdensity_tile,
        vg_tile=target.vg_tile,
        num_steps=num_steps,
        budget=budget,
        chunk=chunk,
        max_depth=max_num_doublings,
        d=d,
        d_pad=d_pad,
        n_params=len(padded_params),
        n_track=num_track,
        divergence_threshold=divergence_threshold,
        metric_kind=metric_kind,
        n_metric=len(metric_ops),
        pack=pack,
        restart_every=restart_every,
        track_rows=track_rows,
        disable=tuple(
            f for f in os.environ.get("FNUTS_DISABLE", "").split(",") if f
        ),
    )
    if pack > 1 and "exit" in os.environ.get("FNUTS_DISABLE", ""):
        raise ValueError("pack > 1 requires the chunked loop (exit enabled)")

    tile_spec = pl.BlockSpec(
        (d_pad, block_chains), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    row_spec = pl.BlockSpec(
        (1, block_chains), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    out_shapes = [
        jax.ShapeDtypeStruct((d_pad, c_pad), jnp.float32),  # acc_x
        jax.ShapeDtypeStruct((1, c_pad), jnp.int32),  # steps
        jax.ShapeDtypeStruct((1, c_pad), jnp.float32),  # grads per chain
    ] + [
        jax.ShapeDtypeStruct((num_steps, c_pad), jnp.float32)
        for _ in range(num_track)
    ]
    out_specs = [tile_spec, row_spec, row_spec] + [
        pl.BlockSpec(
            (num_steps, block_chains), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        for _ in range(num_track)
    ]

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        # the whole machine state lives on the scoped-vmem stack; leave
        # room above the default 16 MiB (v5e has 128 MiB physical VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile_spec,
        ]
        + [
            pl.BlockSpec(op.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for op in metric_ops
        ]
        + param_specs,
        out_specs=out_specs,
        interpret=interpret,
        debug=debug,
    )(
        jnp.array([step_size], jnp.float32),
        jnp.array([seed], jnp.int32),
        x,
        *metric_ops,
        *padded_params,
    )
    acc_x, steps, grads = outs[0], outs[1], outs[2]
    hist = outs[3 : 3 + num_track]

    final_positions = acc_x.T[:C, :d]
    # history: (num_track, S, c_pad) -> (C, S, num_track)
    history = jnp.stack(hist, axis=-1)[:, :C, :].transpose(1, 0, 2)
    total_grads = jnp.sum(grads[0, :C])
    return final_positions, history, total_grads, steps[0, :C]
