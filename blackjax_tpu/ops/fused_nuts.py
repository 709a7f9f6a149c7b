"""The continuous NUTS machine as ONE Pallas kernel: every transition of
every chain in a tile runs with the whole machine state VMEM-resident.

Motivation (ARCHITECTURE §4): the XLA continuous runner's while loop is
carry-bandwidth-bound — the ~20 MB machine carry round-trips HBM every
leaf (~60 ns/chain-grad at m=4 vs the MCLMC scan's 14 ns). This kernel
keeps the state on-chip for the WHOLE run: HBM sees the initial positions
once, the per-close history rows, and the final state.

Semantics: the flattened lockstep machine of
:func:`blackjax_tpu.mcmc.trajectory.flattened_nuts_machine` (one leapfrog
per iteration, branch-free subtree bookkeeping, checkpointed U-turn slots,
biased trajectory merge), with an inline restart: a chain that completes a
transition starts its next one on the following iteration — exactly the
continuous-runner schedule. Works for registered analytic targets
(:class:`blackjax_tpu.ops.fused_leapfrog.TargetKernel`) with a diagonal
metric.

Equivalence: DOCUMENTED equivalence, not bit-identity — randomness is
in-kernel counter-based threefry2x32 keyed on (seed, chain, step,
depth/leaf, stream), a different stream from JAX's host PRNG. The machine
arithmetic is the same as the XLA engine; tests compare acceptance,
trajectory-length distribution, moments and ESS against the XLA path on
identical configurations.
"""
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blackjax_tpu.ops.fused_leapfrog import TargetKernel, _round_up
from blackjax_tpu.ops.fused_mclmc import _threefry2x32

__all__ = ["fused_nuts_run", "make_mxu_safe_hierarchical_target"]

_LANE = 128
_SUBLANE = 8

# per-iteration quantities dumped by the debug trace (fused_nuts_run(trace=N))
TRACE_COLS = (
    "start", "at_start", "direction", "depth", "leaf", "delta", "u_leaf",
    "take", "sub_w", "u_prop", "take_traj", "prop_w", "closing", "done_new",
    "energy", "h0", "ltau", "aborted",
)


def _outer_bcast(col, d_pad):
    """(tc, 1) f32 -> (tc, d_pad) lane-replicated via an MXU outer product
    (Mosaic cannot lane-broadcast columns not born from a lane reduction)."""
    return jax.lax.dot_general(
        col,
        jnp.ones((1, d_pad), jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def make_mxu_safe_hierarchical_target(dim: int) -> TargetKernel:
    """The flagship hierarchical Gaussian with every column born from a
    lane reduction and every column->vector broadcast routed through the
    MXU. The stock ``make_hierarchical_gaussian_target`` tile extracts
    ``log_tau`` with a lane slice (``x[:, 0]``); inside this kernel's
    loop Mosaic propagates that slice layout into the carry and then
    needs an unimplemented lane-broadcast relayout. Extracting the
    column as a masked lane *reduction* keeps every (tc, 1) value in the
    reduction-born layout the rest of the kernel uses."""
    n_theta = dim - 1

    def logdensity_tile(x, mask):
        d_pad = x.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, d_pad), 1)
        is_tau = (lane == 0).astype(x.dtype) * mask
        theta_mask = mask * (lane > 0).astype(x.dtype)
        log_tau = jnp.sum(x * is_tau, axis=1, keepdims=True)  # (tc, 1)
        theta_sq = jnp.sum((x * theta_mask) ** 2, axis=1, keepdims=True)
        return (
            -0.5 * log_tau**2
            - 0.5 * theta_sq * jnp.exp(-log_tau)
            - 0.5 * n_theta * log_tau
        )

    def grad_tile(x, mask):
        d_pad = x.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, d_pad), 1)
        is_tau = (lane == 0).astype(x.dtype) * mask
        theta_mask = mask * (lane > 0).astype(x.dtype)
        log_tau = jnp.sum(x * is_tau, axis=1, keepdims=True)  # (tc, 1)
        exp_neg_col = jnp.exp(-log_tau)
        theta_sq = jnp.sum((x * theta_mask) ** 2, axis=1, keepdims=True)
        g_tau_col = -log_tau + 0.5 * theta_sq * exp_neg_col - 0.5 * n_theta
        exp_neg = _outer_bcast(exp_neg_col, d_pad)
        g_tau = _outer_bcast(g_tau_col, d_pad)
        g_theta = -(x * theta_mask) * exp_neg
        return is_tau * g_tau + g_theta

    def logdensity_fn(x):
        log_tau = x[..., 0]
        theta = x[..., 1:]
        return (
            -0.5 * log_tau**2
            - 0.5 * jnp.sum(theta**2, axis=-1) * jnp.exp(-log_tau)
            - 0.5 * n_theta * log_tau
        )

    return TargetKernel(
        name="hierarchical_gaussian_mxu_safe",
        dim=dim,
        logdensity_tile=logdensity_tile,
        grad_tile=grad_tile,
        logdensity_fn=logdensity_fn,
    )


def _popcount8(x):
    """Population count for small non-negative int32 (< 2^30) via SWAR."""
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def _counter_uniforms(seed, c0, tag, sub):
    """One U[0,1) per element of ``c0`` (int32 array), keyed by (seed,
    c0, tag | sub). 24-bit mantissa construction as in fused_mclmc."""
    b1, _ = _threefry2x32(
        seed.astype(jnp.uint32),
        jnp.uint32(0x9E3779B9),
        c0.astype(jnp.uint32),
        (jnp.uint32(tag) << jnp.uint32(24)) | sub.astype(jnp.uint32),
    )
    return (b1 >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * (2.0**-24)


def _nuts_kernel(
    *refs,
    grad_tile,
    logdensity_tile,
    num_steps,
    budget,
    chunk,
    max_depth,
    d,
    d_pad,
    n_params,
    n_track,
    divergence_threshold,
    disable=(),
    trace=0,
):
    scalars = refs[0]  # SMEM (1,) f32: step_size
    seed_ref = refs[1]  # SMEM (1,) int32
    x_ref, imm_ref = refs[2:4]
    param_refs = refs[4 : 4 + n_params]
    out_refs = refs[4 + n_params :]
    xacc_ref, steps_ref, grads_ref = out_refs[:3]
    hist_refs = out_refs[3 : 3 + n_track]
    trace_refs = out_refs[3 + n_track :]

    eps = scalars[0]
    seed = seed_ref[0]
    tc = x_ref.shape[0]
    S = num_steps

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, d_pad), 1)
    mask = (lane < d).astype(jnp.float32)
    imm = imm_ref[:] * mask  # (1, dp); zero pad lanes kill all pad traffic
    sigma_m = jnp.sqrt(jnp.where(imm > 0.0, 1.0 / jnp.where(imm > 0.0, imm, 1.0), 0.0))
    params = tuple(p[:] for p in param_refs)

    chain_g = (
        jax.lax.broadcasted_iota(jnp.int32, (tc, 1), 0)
        + pl.program_id(0) * tc
    )  # (tc, 1) global chain ids
    # lane-replicated global chain ids for the RNG counter: pure iota — free,
    # exact, and hoisted here because pl.program_id only resolves at the
    # kernel's top level (the interpret-mode loop body can't lower it)
    chain_full = (
        jax.lax.broadcasted_iota(jnp.int32, (tc, d_pad), 0)
        + pl.program_id(0) * tc
    )
    # history rows in f32: Mosaic cannot lane-relayout int/bool (tc,1)
    # columns, so the row match runs in exact small-int float arithmetic
    srow = jax.lax.broadcasted_iota(jnp.int32, (S, tc), 0).astype(jnp.float32)
    # (tc, tc) identity: column->row "transposes" run on the MXU (Mosaic has
    # no lane-broadcast relayout for (tc, 1) columns)
    eye_tc = (
        jax.lax.broadcasted_iota(jnp.int32, (tc, tc), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (tc, tc), 1)
    ).astype(jnp.float32)

    def to_rows(cols):
        """(tc, k) columns -> (k, tc) rows via one MXU contraction."""
        return jax.lax.dot_general(
            cols,
            eye_tc,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def dot_d(a, b):
        return jnp.sum(a * b, axis=1, keepdims=True)

    def kinetic(m):
        return 0.5 * dot_d(m * imm, m)

    def turning(m_left, m_right, m_sum):
        rho = m_sum - 0.5 * (m_left + m_right)
        return (dot_d(imm * m_left, rho) <= 0.0) | (dot_d(imm * m_right, rho) <= 0.0)

    ones_row = jnp.ones((1, d_pad), jnp.float32)

    def bcol(col_f32, precision=jax.lax.Precision.DEFAULT):
        """(tc, 1) f32 column -> (tc, d_pad) lane-replicated, via an MXU
        outer product (Mosaic has no lane-broadcast relayout for columns
        that were not born from a lane reduction).

        PRECISION MATTERS: the default MXU pass truncates inputs to bf16
        (8 mantissa bits). That is EXACT for 0/1 predicates and +-1
        directions — the only things broadcast at DEFAULT — and silently
        corrupting for anything else (measured: bf16-rounded RNG counters
        correlated momentum draws across chains and broke stationarity).
        Broadcast real values with ``precision=HIGH`` (bf16x3, exact for
        ints < 2^21) or ``HIGHEST``."""
        return jax.lax.dot_general(
            col_f32,
            ones_row,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    def f01(pred):
        return jnp.where(pred, jnp.float32(1), jnp.float32(0))

    def sel(pred, a, b, predf=None):
        """Select with a (tc, 1) boolean; (tc, d_pad) operands get the
        predicate lane-replicated through :func:`bcol` first. Pass
        ``predf`` (= ``bcol(f01(pred))``) to reuse one broadcast across
        many selects on the same predicate."""
        if a.ndim == 2 and a.shape[-1] == d_pad:
            pf = bcol(f01(pred)) if predf is None else predf
            return jnp.where(pf > 0.5, a, b)
        return jnp.where(pred, a, b)

    def ld_col(x):
        """Tile logdensity as a (tc, 1) column; tile fns may return
        (tc,) (reduction-born) or (tc, 1) directly."""
        ld = logdensity_tile(x, mask, *params)
        return ld if ld.ndim == 2 else ld[:, None]

    # ---- initial chain state -------------------------------------------
    x0 = x_ref[:]
    g0 = grad_tile(x0, mask, *params)
    ld0 = ld_col(x0)

    zero_v = jnp.zeros((tc, d_pad), jnp.float32)
    # column constants must be iota-born: a replicated-layout constant
    # column forces Mosaic to relayout its {0,*} select partner to {*,*},
    # which is not implemented
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (tc, 1), 0)
    zero_i = col_iota * 0
    zero_s = col_iota.astype(jnp.float32) * 0.0
    fbool = col_iota < 0
    tbool = col_iota >= 0
    neg_inf_col = zero_s - jnp.inf

    state0 = dict(
        # accepted chain state (restart base)
        acc_x=x0, acc_g=g0, acc_ld=ld0,
        steps=zero_i,
        done=zero_s + 1.0,  # f32 flag: forces a start on iteration 0
        # machine registers (garbage until the first restart)
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
        ckpt_m=jnp.zeros((max_depth, tc, d_pad), jnp.float32),
        ckpt_s=jnp.zeros((max_depth, tc, d_pad), jnp.float32),
        hist=tuple(jnp.zeros((S, tc), jnp.float32) for _ in range(n_track)),
    )
    if trace:
        state0["trace"] = tuple(
            jnp.zeros((trace, tc), jnp.float32) for _ in TRACE_COLS
        )
        t_srow = jax.lax.broadcasted_iota(jnp.int32, (trace, tc), 0)
    keys = list(state0.keys())

    def leaf_step(it, carry):
        s = dict(zip(keys, carry))
        # boolean flags ride the carry as f32 0/1 (i1 vector loop carries
        # fail scf.for legalization); local views are bool
        s["done"] = s["done"] > 0.5
        s["div"] = s["div"] > 0.5
        s["turn"] = s["turn"] > 0.5
        live = s["steps"] < S

        # ---- inline restart: chains that closed start the next one ----
        start = s["done"] & live
        startf = bcol(f01(start))
        base_c0 = chain_g * S + s["steps"]  # (tc,1) per-(chain, step) id
        # momentum noise: Box-Muller on threefry keyed (lane; tag | base).
        # The chain part of the counter comes from the hoisted 2-D iota
        # (free, exact); only the steps column rides the MXU broadcast — at
        # HIGHEST precision (Mosaic supports only DEFAULT and HIGHEST),
        # exact for ints < 2^24
        steps_full = bcol(
            s["steps"].astype(jnp.float32), precision=jax.lax.Precision.HIGHEST
        ).astype(jnp.int32)
        base_full = chain_full * S + steps_full
        lane_full = jax.lax.broadcasted_iota(jnp.int32, (tc, d_pad), 1)
        b1, b2 = _threefry2x32(
            jnp.uint32(seed),
            jnp.uint32(0x9E3779B9),
            lane_full.astype(jnp.uint32),
            (jnp.uint32(1) << jnp.uint32(24)) | base_full.astype(jnp.uint32),
        )
        u1 = ((b1 >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) + 1.0) * (
            2.0**-24
        )
        u2 = (b2 >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * (2.0**-24)
        fresh_m = (
            sigma_m
            * mask
            * jnp.sqrt(-2.0 * jnp.log(u1))
            * jnp.cos(6.283185307179586 * u2)
        )

        h0_new = -s["acc_ld"] + kinetic(fresh_m)
        for name, fresh in [
            ("cur_x", s["acc_x"]), ("cur_m", fresh_m), ("cur_g", s["acc_g"]),
            ("cur_ld", s["acc_ld"]),
            ("left_x", s["acc_x"]), ("left_m", fresh_m), ("left_g", s["acc_g"]),
            ("left_ld", s["acc_ld"]),
            ("right_x", s["acc_x"]), ("right_m", fresh_m), ("right_g", s["acc_g"]),
            ("right_ld", s["acc_ld"]),
            ("msum", fresh_m), ("sub_msum", fresh_m * 0.0),
            ("prop_x", s["acc_x"]), ("prop_g", s["acc_g"]), ("prop_ld", s["acc_ld"]),
            ("sub_x", s["acc_x"]), ("sub_g", s["acc_g"]), ("sub_ld", s["acc_ld"]),
        ]:
            s[name] = sel(start, fresh, s[name], predf=startf)
        for name, fresh in [
            ("prop_w", zero_s), ("prop_slpa", neg_inf_col),
            ("sub_w", zero_s), ("sub_slpa", neg_inf_col),
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
        at_start = (s["leaf"] == 0) & active
        u_dir = _counter_uniforms(seed, base_c0, 2, s["depth"])
        new_dir = jnp.where(u_dir < 0.5, -1.0, 1.0)
        direction = sel(at_start, new_dir, s["direction"])
        fwd = direction > 0.0
        at_startf = bcol(f01(at_start))
        fwdf = bcol(f01(fwd))
        cur_x = sel(at_start, sel(fwd, s["right_x"], s["left_x"], fwdf),
                    s["cur_x"], at_startf)
        cur_m = sel(at_start, sel(fwd, s["right_m"], s["left_m"], fwdf),
                    s["cur_m"], at_startf)
        cur_g = sel(at_start, sel(fwd, s["right_g"], s["left_g"], fwdf),
                    s["cur_g"], at_startf)

        # ---- one leapfrog (velocity verlet, diag metric) ---------------
        d_eps = bcol(direction) * eps  # (tc, d_pad), lane-replicated
        m_half = cur_m + 0.5 * d_eps * cur_g
        new_x = cur_x + d_eps * (imm * m_half)
        new_g = grad_tile(new_x, mask, *params)
        new_m = m_half + 0.5 * d_eps * new_g
        new_ld = ld_col(new_x)

        energy = -new_ld + kinetic(new_m)
        delta = s["h0"] - energy
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        leaf_w = delta
        leaf_slpa = jnp.minimum(delta, 0.0)
        leaf_div = (-delta > divergence_threshold) & active

        # ---- subtree progressive (uniform) sampling --------------------
        u_leaf = _counter_uniforms(seed, base_c0, 3, s["nstates"])
        p_acc = jax.nn.sigmoid(leaf_w - s["sub_w"])
        take = (u_leaf < p_acc) & active
        merged_w = jnp.logaddexp(s["sub_w"], leaf_w)
        merged_slpa = jnp.logaddexp(s["sub_slpa"], leaf_slpa)
        takef = bcol(f01(take))
        sub_x = sel(at_start, new_x, sel(take, new_x, s["sub_x"], takef),
                    predf=at_startf)
        sub_g = sel(at_start, new_g, sel(take, new_g, s["sub_g"], takef),
                    predf=at_startf)
        sub_ld = sel(at_start, new_ld, sel(take, new_ld, s["sub_ld"]))
        sub_w = sel(at_start, leaf_w, merged_w)
        sub_slpa = sel(at_start, leaf_slpa, merged_slpa)
        sub_msum = sel(at_start, new_m, s["sub_msum"] + new_m, predf=at_startf)

        # ---- checkpoint slots ------------------------------------------
        leaf_i = s["leaf"]
        idx_max = _popcount8(leaf_i >> 1)
        low_zero_mask = ((~leaf_i) & (leaf_i + 1)) - 1
        idx_min = idx_max - _popcount8(low_zero_mask) + 1
        is_even = (leaf_i % 2) == 0

        ckpt_m, ckpt_s_ = s["ckpt_m"], s["ckpt_s"]
        new_ckpt_m, new_ckpt_s = [], []
        subtree_turning = fbool
        for i in range(0 if "ckpt" in disable else max_depth):
            w_i = (is_even & (idx_max == i) & active)  # (tc,1)
            wf = bcol(f01(w_i))
            new_ckpt_m.append(sel(w_i, new_m, ckpt_m[i], predf=wf))
            new_ckpt_s.append(sel(w_i, sub_msum, ckpt_s_[i], predf=wf))
            chk = (i >= idx_min) & (i <= idx_max) & ~is_even
            subtree_sum = sub_msum - new_ckpt_s[i] + new_ckpt_m[i]
            subtree_turning = subtree_turning | (
                chk & turning(new_ckpt_m[i], new_m, subtree_sum)
            )
        if "ckpt" not in disable:
            s["ckpt_m"] = jnp.stack(new_ckpt_m)
            s["ckpt_s"] = jnp.stack(new_ckpt_s)
        subtree_turning = subtree_turning & active

        # ---- subtree boundary ------------------------------------------
        leaf_next = leaf_i + 1
        subtree_complete = leaf_next >= (1 << s["depth"])
        aborted = leaf_div | subtree_turning
        closing = (subtree_complete | aborted) & active

        closingf = bcol(f01(closing))
        cbf = bcol(f01(closing & ~fwd))
        cff = bcol(f01(closing & fwd))
        msum = sel(closing, s["msum"] + sub_msum, s["msum"], predf=closingf)
        left_x = sel(closing & ~fwd, new_x, s["left_x"], predf=cbf)
        left_m = sel(closing & ~fwd, new_m, s["left_m"], predf=cbf)
        left_g = sel(closing & ~fwd, new_g, s["left_g"], predf=cbf)
        left_ld = sel(closing & ~fwd, new_ld, s["left_ld"])
        right_x = sel(closing & fwd, new_x, s["right_x"], predf=cff)
        right_m = sel(closing & fwd, new_m, s["right_m"], predf=cff)
        right_g = sel(closing & fwd, new_g, s["right_g"], predf=cff)
        right_ld = sel(closing & fwd, new_ld, s["right_ld"])

        # trajectory-level proposal merge (biased toward the new subtree);
        # an aborted subtree contributes acceptance statistics only
        u_prop = _counter_uniforms(seed, base_c0, 4, s["depth"])
        p_biased = jnp.minimum(jnp.exp(sub_w - s["prop_w"]), 1.0)
        take_traj = (u_prop < p_biased) & closing & ~aborted
        merged_pw = jnp.logaddexp(s["prop_w"], sub_w)
        merged_pslpa = jnp.logaddexp(s["prop_slpa"], sub_slpa)
        take_trajf = bcol(f01(take_traj))
        prop_x = sel(take_traj, sub_x, s["prop_x"], predf=take_trajf)
        prop_g = sel(take_traj, sub_g, s["prop_g"], predf=take_trajf)
        prop_ld = sel(take_traj, sub_ld, s["prop_ld"])
        prop_w = sel(closing, sel(aborted, s["prop_w"], merged_pw), s["prop_w"])
        prop_slpa = sel(closing, merged_pslpa, s["prop_slpa"])

        full_turn = closing & turning(left_m, right_m, msum)

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
        jcf = bcol(f01(just_closed))
        steps = sel(just_closed, s["steps"] + 1, s["steps"])
        acc_x = sel(just_closed, prop_x, s["acc_x"], predf=jcf)
        acc_g = sel(just_closed, prop_g, s["acc_g"], predf=jcf)
        acc_ld = sel(just_closed, prop_ld, s["acc_ld"])

        # one MXU transpose for ALL per-chain columns the write needs
        hist = list(s["hist"])
        if "hist" not in disable:
            cols = jnp.concatenate(
                [
                    s["steps"].astype(jnp.float32),
                    just_closed.astype(jnp.float32),
                    prop_x[:, :n_track],
                ],
                axis=1,
            )  # (tc, 2 + n_track)
            rows = to_rows(cols)  # (2 + n_track, tc)
            write_row = (srow == rows[0:1]) & (rows[1:2] > 0.5)  # (S, tc)
            for k in range(n_track):
                hist[k] = jnp.where(write_row, rows[2 + k : 3 + k], hist[k])

        if trace:
            f = lambda b: jnp.where(b, jnp.float32(1), jnp.float32(0))
            ltau = jnp.sum(
                new_x * (lane == 0).astype(jnp.float32), axis=1, keepdims=True
            )
            tcols = dict(
                start=f(start), at_start=f(at_start), direction=direction,
                depth=depth.astype(jnp.float32), leaf=leaf_out.astype(jnp.float32),
                delta=delta, u_leaf=u_leaf, take=f(take), sub_w=sub_w,
                u_prop=u_prop, take_traj=f(take_traj), prop_w=prop_w,
                closing=f(closing), done_new=f(done_new), energy=energy,
                h0=s["h0"], ltau=ltau, aborted=f(aborted),
            )
            rows = to_rows(
                jnp.concatenate([tcols[k] for k in TRACE_COLS], axis=1)
            )  # (len(TRACE_COLS), tc)
            row_mask = t_srow == it
            s["trace"] = tuple(
                jnp.where(row_mask, rows[k : k + 1], s["trace"][k])
                for k in range(len(TRACE_COLS))
            )

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
            div=jnp.where(div, 1.0, 0.0) + zero_s,
            turn=jnp.where(turn, 1.0, 0.0) + zero_s,
            done=jnp.where(done_new | s["done"], 1.0, 0.0) + zero_s,
            steps=steps, acc_x=acc_x, acc_g=acc_g, acc_ld=acc_ld,
            hist=tuple(hist),
        )
        return tuple(s[k] for k in keys)

    if "exit" in disable or trace:
        # no early exit: one flat loop over the full budget (tracing needs
        # the global iteration index)
        carry = jax.lax.fori_loop(
            0, budget, leaf_step, tuple(state0[k] for k in keys)
        )
        final = dict(zip(keys, carry))
        xacc_ref[:] = final["acc_x"]
        steps_ref[:] = final["steps"]
        grads_ref[:] = final["grads"]
        for k in range(n_track):
            hist_refs[k][:] = final["hist"][k]
        if trace:
            for k in range(len(TRACE_COLS)):
                trace_refs[k][:] = final["trace"][k]
        return

    def chunk_body(c, carry):
        # skip whole chunks once the tile is finished. The all-done scalar
        # rides an MXU reduction: Mosaic cannot relayout an int (tc, 1)
        # column to a replicated scalar directly
        steps_now = carry[keys.index("steps")]
        left = jnp.where(steps_now < S, jnp.float32(1), jnp.float32(0))
        remaining = jax.lax.dot_general(
            jnp.ones((1, tc), jnp.float32),
            left,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, 1)
        return jax.lax.cond(
            remaining[0, 0] > 0.5,
            lambda cr: jax.lax.fori_loop(0, chunk, leaf_step, cr),
            lambda cr: cr,
            carry,
        )

    carry = jax.lax.fori_loop(
        0, budget // chunk, chunk_body, tuple(state0[k] for k in keys)
    )
    final = dict(zip(keys, carry))

    xacc_ref[:] = final["acc_x"]
    steps_ref[:] = final["steps"]
    grads_ref[:] = final["grads"]
    for k in range(n_track):
        hist_refs[k][:] = final["hist"][k]


def fused_nuts_run(
    positions,
    inverse_mass_matrix,
    step_size,
    *,
    target: TargetKernel,
    num_steps: int,
    max_num_doublings: int = 8,
    seed: int = 0,
    num_track: int = 8,
    tile_chains: int = 256,
    budget: int = None,
    chunk: int = 64,
    divergence_threshold: float = 1000.0,
    interpret: bool = False,
    debug: bool = False,
    trace: int = 0,
):
    """Run ``num_steps`` NUTS transitions per chain entirely on-chip.

    ``positions``: ``(C, d)`` f32; ``inverse_mass_matrix``: diagonal
    ``(d,)``. Returns ``(final_positions (C, d), history (C, num_steps,
    num_track), total_grads, steps (C,))`` — ``steps[c] < num_steps``
    means the iteration ``budget`` was exhausted before chain ``c``
    finished (raise the budget).
    """
    C, d = positions.shape
    if d != target.dim:
        raise ValueError(f"positions dim {d} != registered target dim {target.dim}")
    if num_track > d:
        raise ValueError(f"num_track={num_track} > dim {d}")
    d_pad = _round_up(d, _LANE)
    tile_chains = max(_SUBLANE, _round_up(min(tile_chains, max(C, 1)), _SUBLANE))
    c_pad = _round_up(C, tile_chains)
    n_tiles = c_pad // tile_chains
    if budget is None:
        # generous default: ~2x the expected total leaves per chain at the
        # benchmark geometry (mean ~15 leaves/transition)
        budget = 32 * num_steps
    budget = _round_up(budget, chunk)

    x = jnp.pad(positions.astype(jnp.float32), ((0, c_pad - C), (0, d_pad - d)))
    imm = jnp.pad(
        jnp.broadcast_to(inverse_mass_matrix, (d,)).astype(jnp.float32),
        (0, d_pad - d),
    )[None, :]

    def _pad_param(a):
        a = jnp.asarray(a, jnp.float32)
        if a.ndim == 1:
            # (d,) -> (1, d_pad); keep single-row broadcast semantics
            return jnp.pad(a, (0, d_pad - a.shape[0]))[None, :]
        rows = _round_up(a.shape[0], _SUBLANE)
        cols = _round_up(a.shape[1], _LANE)
        return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))

    padded_params = tuple(_pad_param(p) for p in target.params)

    kernel = functools.partial(
        _nuts_kernel,
        grad_tile=target.grad_tile,
        logdensity_tile=target.logdensity_tile,
        num_steps=num_steps,
        budget=budget,
        chunk=chunk,
        max_depth=max_num_doublings,
        d=d,
        d_pad=d_pad,
        n_params=len(padded_params),
        n_track=num_track,
        divergence_threshold=divergence_threshold,
        disable=tuple(
            f for f in os.environ.get("FNUTS_DISABLE", "").split(",") if f
        ),
        trace=trace,
    )

    tile_spec = pl.BlockSpec(
        (tile_chains, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    rep2 = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )

    out_shapes = [
        jax.ShapeDtypeStruct((c_pad, d_pad), jnp.float32),  # acc_x
        jax.ShapeDtypeStruct((c_pad, 1), jnp.int32),  # steps
        jax.ShapeDtypeStruct((c_pad, 1), jnp.float32),  # grads per chain
    ] + [
        jax.ShapeDtypeStruct((num_steps, c_pad), jnp.float32)
        for _ in range(num_track)
    ]
    out_specs = [
        tile_spec,
        pl.BlockSpec((tile_chains, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_chains, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(
            (num_steps, tile_chains), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        for _ in range(num_track)
    ]
    if trace:
        out_shapes += [
            jax.ShapeDtypeStruct((trace, c_pad), jnp.float32)
            for _ in TRACE_COLS
        ]
        out_specs += [
            pl.BlockSpec(
                (trace, tile_chains), lambda i: (0, i), memory_space=pltpu.VMEM
            )
            for _ in TRACE_COLS
        ]

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        # the whole machine state lives on the scoped-vmem stack; the
        # default 16 MiB limit caps tile_chains at 128 (measured: 17.6 MiB
        # at 256x128). v5e has 128 MiB VMEM; leave headroom for I/O
        # double-buffering.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile_spec,
            rep2((1, d_pad)),
        ]
        + [rep2(pp.shape) for pp in padded_params],
        out_specs=out_specs,
        interpret=interpret,
        debug=debug,
    )(
        jnp.asarray([step_size], jnp.float32),
        jnp.asarray([seed], jnp.int32),
        x,
        imm,
        *padded_params,
    )
    acc_x, steps, grads = outs[0], outs[1], outs[2]
    hist = outs[3 : 3 + num_track]
    history = jnp.stack([h[:, :C] for h in hist], axis=-1).transpose(1, 0, 2)
    result = (
        acc_x[:C, :d],
        history,  # (C, num_steps, num_track)
        jnp.sum(grads[:C]),
        steps[:C, 0],
    )
    if trace:
        traces = {
            name: t[:, :C]
            for name, t in zip(TRACE_COLS, outs[3 + num_track :])
        }
        return result + (traces,)
    return result
