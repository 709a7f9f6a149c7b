"""Scheme-A MCLMC warmup with a Low-Rank-Diagonal (LRD) inverse mass matrix:
a cheap diagonal unadjusted pilot reaches the typical set, a thin SVD of the
standardized pilot draws extracts the top-k correlation directions, then
multi-chain tuning calibrates ``(L, step_size)`` in the LRD geometry.

Behavioral parity target: ``blackjax/adaptation/mclmc_lrd_adaptation.py``
(``mclmc_lrd_warmup`` :412 — pilot via ``mclmc_find_L_and_step_size``, Geyer
ESS rank guard ``k_safe = floor(n_eff/2)`` :636-655, SVD extraction
``_extract_lrd_from_samples`` :235 with |lam-1| selection, residual-spectrum
kappa_eff :296-370, sqrt(d) scaling-law warm-start gated at kappa_eff <= 5
:688-717, adjusted dispatch with the L-init floor guard and ``frac_tune2=0``
hard constraint :762-829, DA-ceiling warning :374-410).

TPU notes: phase 3/4 chains are vmapped (one compiled tuner, chain axis
batched); the SVD runs once on host-visible draws between phases.
"""
import warnings
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.adaptation.adjusted_mclmc_adaptation import (
    adjusted_mclmc_find_L_and_step_size,
)
from blackjax_tpu.adaptation.mclmc_adaptation import (
    MCLMCAdaptationState,
    mclmc_find_L_and_step_size,
)
from blackjax_tpu.adaptation.metric_estimators import (
    select_top_eigenvalues_by_informativeness,
)
from blackjax_tpu.diagnostics import effective_sample_size
from blackjax_tpu.mcmc import adjusted_mclmc as _adjusted_mclmc_mod
from blackjax_tpu.mcmc import mclmc as _mclmc_mod
from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix

__all__ = ["MCLMCLRDAdaptationState", "mclmc_lrd_warmup"]

_INNER_KERNELS = frozenset({"mclmc", "adjusted_mclmc"})
_WARMUP_STEP_INITS = frozenset({"law", "default"})

# sqrt(d) scaling-law constants: at good preconditioning (kappa_eff <~ 5)
# MCLMC's optimal step and decoherence length are dimension-independent
# multiples of sqrt(d)
_SQRT_D_STEP_CONST = 1.22
_SQRT_D_L_CONST = 0.85
_KAPPA_EFF_GATE = 5.0


class MCLMCLRDAdaptationState(NamedTuple):
    """Warmup result: adapted ``(L, step_size)``, the LRD inverse mass
    matrix, and a provenance dict (``n_eff``, ``k_safe``, ``k_used``,
    ``pilot_*``, ``lrd_*``, ``kappa_eff_pilot``, ``e1_fired``, and on the
    adjusted path ``L_init`` / ``floor_active`` / ``N_sample``)."""

    L: float
    step_size: float
    inverse_mass_matrix: LowRankInverseMassMatrix
    diagnostics: dict


def _extract_lrd_from_samples(flat_positions, k: int):
    """SVD the standardized ``(n, d)`` pilot draws into an LRD metric.

    Returns ``(sigma, U_k, lam_k, lam_all_sorted)`` where ``lam_all_sorted``
    is the FULL correlation eigenspectrum ordered by descending ``|lam - 1|``
    (so ``lam_k == lam_all_sorted[:k]``) — the residual tail feeds the
    kappa_eff computation without a second SVD."""
    mean = jnp.mean(flat_positions, axis=0)
    sigma = jnp.std(flat_positions, axis=0)
    # a constant coordinate's std is float noise (~eps * |mean|), not exactly
    # zero — standardizing by it would feed pure rounding noise into the SVD
    # as an O(1) spurious direction; treat it as unit scale instead
    eps = jnp.finfo(sigma.dtype).eps
    degenerate = sigma <= 64.0 * eps * (jnp.abs(mean) + 1.0)
    sigma = jnp.where(degenerate, 1.0, sigma)

    standardized = (flat_positions - mean[None, :]) / sigma[None, :]
    n = flat_positions.shape[0]
    _, S, Vt = jnp.linalg.svd(standardized, full_matrices=False)
    lam = (S**2) / n  # correlation-matrix eigenvalues

    U_k, lam_k = select_top_eigenvalues_by_informativeness(
        lam, Vt.T, k, tail_handling="raw"
    )
    order = jnp.argsort(jnp.abs(lam - 1.0))[::-1]
    return sigma, U_k, lam_k, lam[order]


def _kappa_eff_pilot(lam_all_sorted, k: int) -> float:
    """Effective condition number of M^{-1} Sigma^{-1} for the pilot LRD IMM.

    The k captured directions are exactly whitened (eigenvalue 1); each
    residual direction with correlation eigenvalue mu contributes 1/mu. The
    spread therefore comes from the RESIDUAL tail, not the captured head —
    kappa_eff = max/min over {1} U {1/mu_i : i >= k}."""
    lam = jnp.asarray(lam_all_sorted)
    n_svd = lam.size
    if n_svd == 0 or k >= n_svd:
        return 1.0
    residual = lam[k:]
    residual = jnp.where(residual < 1e-12, jnp.ones_like(residual), residual)
    inv = 1.0 / residual
    max_eig = float(jnp.maximum(jnp.max(inv), 1.0))
    min_eig = float(jnp.minimum(jnp.min(inv), 1.0))
    if min_eig <= 0.0:
        return float("inf")
    return max_eig / min_eig


def _warn_da_ceiling(final_step_size, L_anchor, floor_factor):
    """Warn when the adapted step sits at the DA ceiling ``L/1.1`` — the
    signature of a ceiling-constrained (not converged) step-size tune."""
    ceiling = L_anchor / 1.1
    ratio = final_step_size / ceiling
    if ratio >= 0.999:
        warnings.warn(
            f"mclmc_lrd_warmup (adjusted path): adapted step_size "
            f"({final_step_size:.4g}) is at the DA ceiling L/1.1="
            f"{ceiling:.4g} (ratio={ratio:.3f}); the tuner was likely "
            f"constrained, not converged. Consider raising floor_factor "
            f"(currently {floor_factor}) to ~1.5 for stiff targets.",
            UserWarning,
            stacklevel=3,
        )


def mclmc_lrd_warmup(
    logdensity_fn,
    position,
    rng_key,
    *,
    k: int = 10,
    pilot_num_warmup: int = 1000,
    pilot_num_samples: int = 5000,
    lrd_num_steps: int = 1000,
    num_chains: int = 4,
    inner_kernel: str = "mclmc",
    floor_factor: float = 1.15,
    adjusted_num_steps: int = 3000,
    adjusted_target: float = 0.9,
    warmup_step_init: str = "law",
) -> MCLMCLRDAdaptationState:
    """Pilot-free (Scheme A) LRD warmup.

    Phases: (1) single-chain diagonal pilot via
    :func:`mclmc_find_L_and_step_size` + ``pilot_num_samples`` draws; (2) SVD
    LRD extraction with the ESS rank guard ``k_used = min(k, max(floor(
    n_eff/2), 1))``; (3) ``num_chains`` vmapped unadjusted tuners in the LRD
    geometry, mean-pooled; (4) ``inner_kernel`` dispatch — ``"mclmc"``
    returns phase-3 directly, ``"adjusted_mclmc"`` warm-starts the adjusted
    tuner with ``frac_tune2=0`` (the variance-L estimator reads
    original-space variances and is incompatible with a baked-in LRD IMM)
    and the floor-guarded ``L_init = max(L, floor_factor * step)``.
    """
    if inner_kernel not in _INNER_KERNELS:
        raise ValueError(
            f"inner_kernel must be one of {sorted(_INNER_KERNELS)!r}, got "
            f"{inner_kernel!r}."
        )
    if warmup_step_init not in _WARMUP_STEP_INITS:
        raise ValueError(
            f"warmup_step_init must be one of {sorted(_WARMUP_STEP_INITS)!r}, "
            f"got {warmup_step_init!r}."
        )

    init_key, warmup_key, sample_key, lrd_key, adj_key = jax.random.split(rng_key, 5)

    # phase 1: diagonal pilot
    base_kernel = _mclmc_mod.build_kernel()
    init_state = _mclmc_mod.init(position, logdensity_fn, init_key)
    pilot_state, pilot_params, _ = mclmc_find_L_and_step_size(
        mclmc_kernel=base_kernel,
        num_steps=pilot_num_warmup,
        state=init_state,
        rng_key=warmup_key,
        logdensity_fn=logdensity_fn,
        diagonal_preconditioning=True,
    )

    def pilot_step(state, key):
        next_state, _ = base_kernel(
            rng_key=key,
            state=state,
            logdensity_fn=logdensity_fn,
            inverse_mass_matrix=pilot_params.inverse_mass_matrix,
            L=pilot_params.L,
            step_size=pilot_params.step_size,
        )
        return next_state, next_state.position

    _, pilot_positions = jax.lax.scan(
        pilot_step, pilot_state, jax.random.split(sample_key, pilot_num_samples)
    )
    flat_pilot = jax.vmap(lambda p: ravel_pytree(p)[0])(pilot_positions)

    # rank guard: Geyer ESS (min over dims) bounds the supportable rank
    if pilot_num_samples >= 2:
        n_eff = float(jnp.min(effective_sample_size(flat_pilot[None, :, :])))
    else:
        n_eff = 0.0
    k_safe = int(n_eff / 2)
    k_used = min(k, max(k_safe, 1))
    if k_used < k:
        warnings.warn(
            f"mclmc_lrd_warmup: requested k={k} exceeds the rank-safety bound "
            f"k_safe=floor(n_eff/2)={k_safe} (n_eff={n_eff:.1f} from "
            f"{pilot_num_samples} pilot draws); clamping to k_used={k_used}. "
            "Increase pilot_num_samples or reduce k.",
            UserWarning,
            stacklevel=2,
        )

    # phase 2: SVD extraction
    sigma, U_k, lam_k, lam_all_sorted = _extract_lrd_from_samples(flat_pilot, k_used)
    lrd_imm = LowRankInverseMassMatrix(sigma=sigma, U=U_k, lam=lam_k)
    kappa_eff = _kappa_eff_pilot(lam_all_sorted, k_used)

    # phase 3 DA init: sqrt(d) scaling-law warm-start, gated on whitening
    e1_fired = False
    if warmup_step_init == "law" and kappa_eff <= _KAPPA_EFF_GATE:
        e1_fired = True
        sqrt_d = jnp.sqrt(float(flat_pilot.shape[1]))
        phase3_init = MCLMCAdaptationState(
            L=jnp.asarray(_SQRT_D_L_CONST * sqrt_d),
            step_size=jnp.asarray(_SQRT_D_STEP_CONST * sqrt_d),
            inverse_mass_matrix=pilot_params.inverse_mass_matrix,  # overridden below
        )
    else:
        phase3_init = MCLMCAdaptationState(
            L=pilot_params.L,
            step_size=pilot_params.step_size,
            inverse_mass_matrix=pilot_params.inverse_mass_matrix,  # overridden below
        )

    # phase 3: vmapped multi-chain unadjusted tuning in the LRD geometry
    def lrd_kernel(rng_key, state, logdensity_fn, inverse_mass_matrix, L, step_size):
        return base_kernel(
            rng_key=rng_key,
            state=state,
            logdensity_fn=logdensity_fn,
            inverse_mass_matrix=lrd_imm,  # always route through the LRD IMM
            L=L,
            step_size=step_size,
        )

    all_keys = jax.random.split(lrd_key, 2 * num_chains)
    chain_positions = jax.tree.map(
        lambda x: jnp.stack([x] * num_chains), pilot_state.position
    )
    chain_states = jax.vmap(lambda kk, x: _mclmc_mod.init(x, logdensity_fn, kk))(
        all_keys[:num_chains], chain_positions
    )

    @jax.vmap
    def tune_one(kk, chain_state):
        _, params, _ = mclmc_find_L_and_step_size(
            mclmc_kernel=lrd_kernel,
            num_steps=lrd_num_steps,
            state=chain_state,
            rng_key=kk,
            logdensity_fn=logdensity_fn,
            diagonal_preconditioning=False,
            params=phase3_init,
        )
        return params

    lrd_params = tune_one(all_keys[num_chains:], chain_states)
    lrd_L = float(jnp.mean(lrd_params.L))
    lrd_step_size = float(jnp.mean(lrd_params.step_size))

    diagnostics = {
        "inner_kernel": inner_kernel,
        "n_eff": n_eff,
        "k_safe": k_safe,
        "k_used": k_used,
        # unadjusted MCLMC costs 2 gradient evaluations per step
        "pilot_num_grad_evals": (pilot_num_warmup + pilot_num_samples) * 2,
        "pilot_L": float(pilot_params.L),
        "pilot_step_size": float(pilot_params.step_size),
        "lrd_L": lrd_L,
        "lrd_step_size": lrd_step_size,
        "e1_fired": e1_fired,
        "kappa_eff_pilot": kappa_eff,
    }

    # phase 4: inner-kernel dispatch
    if inner_kernel == "mclmc":
        final_L = jnp.asarray(lrd_L)
        final_step_size = jnp.asarray(lrd_step_size)
    else:
        adj_base = _adjusted_mclmc_mod.build_kernel()

        def adj_lrd_kernel(
            rng_key,
            state,
            logdensity_fn,
            step_size,
            inverse_mass_matrix,
            integration_steps_params,
        ):
            return adj_base(
                rng_key=rng_key,
                state=state,
                logdensity_fn=logdensity_fn,
                step_size=step_size,
                integration_steps_params=integration_steps_params,
                inverse_mass_matrix=lrd_imm,  # always route through the LRD IMM
            )

        # floor guard: never let the DA ceiling L/1.1 bind below the oracle
        L_floor = floor_factor * lrd_step_size
        floor_active = bool(L_floor > lrd_L)
        L_init = float(max(lrd_L, L_floor))
        adj_init = MCLMCAdaptationState(
            L=jnp.asarray(L_init),
            step_size=jnp.asarray(lrd_step_size),
            inverse_mass_matrix=pilot_params.inverse_mass_matrix,  # placeholder
        )

        adj_states = jax.vmap(lambda x: _adjusted_mclmc_mod.init(x, logdensity_fn))(
            chain_positions
        )

        @jax.vmap
        def adj_tune_one(kk, chain_state):
            _, params, _ = adjusted_mclmc_find_L_and_step_size(
                mclmc_kernel=adj_lrd_kernel,
                logdensity_fn=logdensity_fn,
                num_steps=adjusted_num_steps,
                state=chain_state,
                rng_key=kk,
                target=adjusted_target,
                frac_tune1=0.5,
                frac_tune2=0.0,  # variance-L estimator incompatible with LRD IMM
                diagonal_preconditioning=False,
                params=adj_init,
            )
            return params

        adj_params = adj_tune_one(jax.random.split(adj_key, num_chains), adj_states)
        final_step_size = jnp.mean(adj_params.step_size)
        final_L = jnp.mean(adj_params.L)
        _warn_da_ceiling(float(final_step_size), float(final_L), floor_factor)

        diagnostics["L_init"] = L_init
        diagnostics["floor_active"] = floor_active
        diagnostics["N_sample"] = round(
            float(final_L) / max(float(final_step_size), 1e-10)
        )

    return MCLMCLRDAdaptationState(
        L=final_L,
        step_size=final_step_size,
        inverse_mass_matrix=lrd_imm,
        diagnostics=diagnostics,
    )
