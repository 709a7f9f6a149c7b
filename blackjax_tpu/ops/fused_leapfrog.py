"""Fused multi-step leapfrog in Pallas for registered analytic targets.

Reference counterpart: the reference has no fused integrator — its leapfrog
is Python-composed ops per step (``blackjax/mcmc/integrators.py:128-192``),
which on TPU costs one HBM round-trip of the ``(chains, d)`` state per kick
and drift. This kernel instead tiles chains into VMEM-resident blocks and
runs ALL ``num_steps`` velocity-Verlet steps on-chip: per trajectory the
state moves HBM->VMEM->HBM exactly once, and the gradient is an inlined
analytic tile function (no recomputation graph, no intermediate buffers).

Layout: positions/momenta are ``(C, d)`` f32; chains pad to the tile
sublane multiple and dimensions pad to the 128-lane boundary, with a lane
mask threaded through the target functions so padding never contaminates
reductions. The same kernel runs under ``interpret=True`` on CPU (used by
the tests), so correctness is checked against the XLA integrator
everywhere.
"""
import dataclasses
import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blackjax_tpu.types import Array

__all__ = [
    "TargetKernel",
    "register_target",
    "get_registered_target",
    "fused_leapfrog",
]

_LANE = 128
_SUBLANE = 8


@dataclasses.dataclass(frozen=True)
class TargetKernel:
    """An analytic target usable inside the fused kernel.

    ``logdensity_tile(x, mask) -> (tc,)`` and ``grad_tile(x, mask) ->
    (tc, dp)`` operate on a padded ``(tile_chains, d_padded)`` block; both
    must ignore lanes where ``mask == 0`` and return zero gradient there.
    ``dim`` is the true (unpadded) dimension the closures were built for.
    """

    name: str
    dim: int
    logdensity_tile: Callable
    grad_tile: Callable
    # the plain per-position logdensity (for XLA-path parity checks)
    logdensity_fn: Callable
    # per-target (d,)-shaped parameter vectors, passed into the kernel as
    # real VMEM operands (pallas rejects captured array constants); the tile
    # functions receive them zero-padded as trailing (1, d_pad) arguments
    params: tuple = ()


_REGISTRY: dict = {}


def register_target(target: TargetKernel) -> TargetKernel:
    _REGISTRY[(target.name, target.dim)] = target
    return target


def get_registered_target(name: str, dim: int) -> TargetKernel:
    try:
        return _REGISTRY[(name, dim)]
    except KeyError:
        raise ValueError(
            f"No registered target kernel {name!r} at dim={dim}; available: "
            f"{sorted(_REGISTRY)}"
        ) from None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _leapfrog_kernel(
    *refs,
    grad_tile: Callable,
    logdensity_tile: Callable,
    num_steps: int,
    d: int,
    d_pad: int,
    n_params: int,
):
    """One chain tile: full velocity-Verlet trajectory in VMEM.

    Produces the endpoint state and the endpoint energy
    ``-logdensity + 0.5 m^T M^{-1} m`` (the MH accept input) per chain.
    """
    eps_ref, x_ref, m_ref, imm_ref = refs[:4]
    param_refs = refs[4 : 4 + n_params]
    x_out_ref, m_out_ref, energy_ref = refs[4 + n_params :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, d_pad), 1)
    mask = (lane < d).astype(x_ref.dtype)  # (1, dp)

    x = x_ref[:]
    m = m_ref[:]
    imm = imm_ref[:] * mask  # (1, dp)
    eps = eps_ref[0, 0]
    params = tuple(p[:] for p in param_refs)

    # velocity verlet: half kick, (full drift + full kick) x (n-1), full
    # drift, half kick — expressed as the standard loop with half kicks at
    # the boundary
    g = grad_tile(x, mask, *params)

    def body(_, carry):
        x, m, g = carry
        m = m + 0.5 * eps * g
        x = x + eps * (m * imm)
        g = grad_tile(x, mask, *params)
        m = m + 0.5 * eps * g
        return x, m, g

    x, m, g = jax.lax.fori_loop(0, num_steps, body, (x, m, g))

    x_out_ref[:] = x * mask
    m_out_ref[:] = m * mask
    kinetic = 0.5 * jnp.sum(m * m * imm, axis=1)
    energy_ref[:, 0] = -logdensity_tile(x, mask, *params) + kinetic


def fused_leapfrog(
    positions: Array,
    momenta: Array,
    inverse_mass_matrix: Array,
    step_size,
    *,
    target: TargetKernel,
    num_steps: int,
    tile_chains: int = 256,
    interpret: bool = False,
):
    """Run ``num_steps`` fused velocity-Verlet steps for every chain.

    Parameters: ``positions``/``momenta`` are ``(C, d)`` f32,
    ``inverse_mass_matrix`` a ``(d,)`` diagonal. Returns ``(positions,
    momenta, energy)`` with ``energy = -logdensity(x_end) + KE(m_end)``
    per chain — everything the MH accept needs without another gradient or
    logdensity evaluation on the XLA side.

    ``interpret=True`` runs the same kernel through the Pallas interpreter
    (CPU-testable).
    """
    C, d = positions.shape
    if d != target.dim:
        raise ValueError(
            f"positions dim {d} != registered target dim {target.dim}"
        )
    d_pad = _round_up(d, _LANE)
    tile_chains = max(_SUBLANE, _round_up(min(tile_chains, max(C, 1)), _SUBLANE))
    c_pad = _round_up(C, tile_chains)

    def pad(a):
        return jnp.pad(
            a.astype(jnp.float32), ((0, c_pad - C), (0, d_pad - d))
        )

    x = pad(positions)
    m = pad(momenta)
    imm = jnp.pad(
        jnp.broadcast_to(inverse_mass_matrix, (d,)).astype(jnp.float32),
        (0, d_pad - d),
    )[None, :]

    kernel = functools.partial(
        _leapfrog_kernel,
        grad_tile=target.grad_tile,
        logdensity_tile=target.logdensity_tile,
        num_steps=num_steps,
        d=d,
        d_pad=d_pad,
        n_params=len(target.params),
    )

    def _pad_param(p):
        a = jnp.asarray(p, jnp.float32)
        if a.ndim == 1 and a.shape[0] == d:
            # per-coordinate vector: same padded layout as the state
            return jnp.pad(a, (0, d_pad - d))[None, :]
        a = jnp.atleast_2d(a)
        rows = _round_up(a.shape[0], _SUBLANE)
        cols = _round_up(a.shape[1], _LANE)
        return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))

    padded_params = tuple(_pad_param(p) for p in target.params)
    param_specs = [
        pl.BlockSpec(pp.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for pp in padded_params
    ]

    eps = jnp.asarray(step_size, jnp.float32).reshape(1, 1)
    grid = (c_pad // tile_chains,)
    chain_spec = pl.BlockSpec(
        (tile_chains, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    x_out, m_out, energy = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            chain_spec,
            chain_spec,
            pl.BlockSpec((1, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        + param_specs,
        out_specs=[
            chain_spec,
            chain_spec,
            pl.BlockSpec((tile_chains, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((c_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((c_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(eps, x, m, imm, *padded_params)

    return x_out[:C, :d], m_out[:C, :d], energy[:C, 0]


# ---------------------------------------------------------------------------
# Registered targets
# ---------------------------------------------------------------------------


def make_hierarchical_gaussian_target(dim: int) -> TargetKernel:
    """The flagship funnel-like hierarchical Gaussian
    (``blackjax_tpu.models.targets.hierarchical_gaussian``):
    ``log_tau ~ N(0, 1)``, ``theta_i | log_tau ~ N(0, e^{log_tau})``.

    Lane 0 carries ``log_tau``; lanes ``1..dim-1`` carry theta. All
    reductions mask the padding lanes.
    """
    n_theta = dim - 1

    def logdensity_tile(x, mask):
        d_pad = x.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, d_pad), 1)
        theta_mask = mask * (lane > 0).astype(x.dtype)
        log_tau = x[:, 0]
        theta_sq = jnp.sum((x * theta_mask) ** 2, axis=1)
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
        log_tau = x[:, 0:1]  # (tc, 1)
        exp_neg = jnp.exp(-log_tau)
        theta_sq = jnp.sum((x * theta_mask) ** 2, axis=1, keepdims=True)
        g_tau = -log_tau + 0.5 * theta_sq * exp_neg - 0.5 * n_theta
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

    return register_target(
        TargetKernel(
            name="hierarchical_gaussian",
            dim=dim,
            logdensity_tile=logdensity_tile,
            grad_tile=grad_tile,
            logdensity_fn=logdensity_fn,
        )
    )


def make_gaussian_target(dim: int, variances=None) -> TargetKernel:
    """Independent Gaussian ``N(0, diag(variances))`` (ill-conditioned
    Gaussian of ``models.targets`` when ``variances`` is a ladder)."""
    import numpy as np

    if variances is None:
        inv_var_host = np.ones(dim, np.float32)
    else:
        inv_var_host = 1.0 / np.asarray(variances, np.float32)
    # hashable: TargetKernel rides through jit as a static argument
    inv_var_param = tuple(float(v) for v in inv_var_host)

    def logdensity_tile(x, mask, inv_var):
        return -0.5 * jnp.sum(x * x * inv_var * mask, axis=1)

    def grad_tile(x, mask, inv_var):
        return -x * inv_var * mask

    def logdensity_fn(x):
        return -0.5 * jnp.sum(x**2 * jnp.asarray(inv_var_host), axis=-1)

    return register_target(
        TargetKernel(
            name="gaussian",
            dim=dim,
            logdensity_tile=logdensity_tile,
            grad_tile=grad_tile,
            logdensity_fn=logdensity_fn,
            params=(inv_var_param,),
        )
    )


def make_logistic_regression_target(X, y, prior_scale: float = 10.0) -> TargetKernel:
    """Bayesian logistic regression ``w ~ N(0, prior_scale^2 I)``,
    ``y_i ~ Bernoulli(sigmoid(x_i . w))`` — the matmul-dominated target class
    where the fused kernel genuinely engages the MXU: the design matrix is
    VMEM-resident across the whole trajectory and each gradient is two
    ``(chains, N) x (N, d)`` contractions.

    Reference counterpart: the covertype logistic-regression workload of the
    reference benchmark suite (``tests/test_benchmarks.py``; here with an
    explicit design matrix so the kernel is self-contained).
    """
    import numpy as np

    X = np.asarray(X, np.float32)
    y = np.asarray(y, np.float32).reshape(-1)
    n_data, dim = X.shape
    inv_prior_var = 1.0 / float(prior_scale) ** 2

    # pre-pad the data axis to the lane boundary HERE so the logits
    # intermediate (chains, N) is 128-aligned and every parameter shares one
    # consistent N; the validity mask rides along as a parameter
    n_pad = _round_up(n_data, _LANE)
    X_full = np.zeros((n_pad, dim), np.float32)
    X_full[:n_data] = X
    y_row = np.zeros((1, n_pad), np.float32)
    y_row[0, :n_data] = y
    row_mask = np.zeros((1, n_pad), np.float32)
    row_mask[0, :n_data] = 1.0

    def _logits(w, X_pad):
        # (tc, dp) x (np, dp) contracting dp -> (tc, np); padded w-lanes hit
        # zero-padded X columns, padded X rows give logits the mask removes
        return jax.lax.dot_general(
            w,
            X_pad,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def logdensity_tile(w, mask, X_pad, y_pad, mask_pad):
        logits = _logits(w * mask, X_pad)  # (tc, np_)
        valid = mask_pad[0][None, :]  # (1, np_)
        y_row = y_pad[0][None, :]
        loglik = valid * (y_row * logits - jnp.logaddexp(0.0, logits))
        prior = -0.5 * inv_prior_var * jnp.sum((w * mask) ** 2, axis=1)
        return jnp.sum(loglik, axis=1) + prior

    def grad_tile(w, mask, X_pad, y_pad, mask_pad):
        logits = _logits(w * mask, X_pad)
        valid = mask_pad[0][None, :]
        resid = valid * (y_pad[0][None, :] - jax.nn.sigmoid(logits))  # (tc, np_)
        # (tc, np_) x (np_, dp) -> (tc, dp); padded X columns are zero
        grad_lik = jax.lax.dot_general(
            resid,
            X_pad,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (grad_lik - inv_prior_var * w) * mask

    def logdensity_fn(w):
        logits = w @ X.T if w.ndim == 1 else jnp.einsum("...d,nd->...n", w, X)
        loglik = jnp.sum(
            jnp.asarray(y) * logits - jnp.logaddexp(0.0, logits), axis=-1
        )
        return loglik - 0.5 * inv_prior_var * jnp.sum(w**2, axis=-1)

    return register_target(
        TargetKernel(
            name="logistic_regression",
            dim=dim,
            logdensity_tile=logdensity_tile,
            grad_tile=grad_tile,
            logdensity_fn=logdensity_fn,
            params=(X_full, y_row, row_mask),
        )
    )
