"""Noise schedules for the binary (bit-flip) D3PM forward process.

The forward process is a per-bit symmetric flip channel. Because every
single-step transition matrix is a symmetric 2x2 stochastic matrix

    Q_t = [[1 - beta_t, beta_t],
           [beta_t, 1 - beta_t]],

the entire schedule is characterised by two scalar arrays rather than stacks
of matrices (a deliberate TPU-first simplification — products of symmetric
flip channels are symmetric flip channels, so we never materialise 2x2
matmuls in the hot path):

- ``betas[t]``      — single-step flip probability P(x_t != x_{t-1}).
- ``cum_flip[t]``   — cumulative flip probability P(x_t != x_0), i.e. the
  off-diagonal of Q̄_t = Q_t @ ... @ Q_1.

Two schedule families, matching the reference's two generations:

- ``linear``  — reference phases 1–3: ``betas = linspace(0.001, 0.5, T+1)``
  (float32), and — a reference quirk kept for behavioural parity — the
  *per-step* matrix Q_t is applied as if it were cumulative in ``q_sample``
  (reference ``multi_qubit_any_state/diffusion.py:14-52`` builds per-t
  matrices with no cumulative product and uses ``Q[t]`` directly on x_0).
  Hence for this family ``cum_flip == betas``.
- ``cosine``  — reference phase 4: Nichol & Dhariwal ᾱ(t), β_t clipped to
  0.999, β_0 = 0, with a true cumulative product chain
  (reference ``RQC_dataset_building_phase/diffusion.py:15-43``).

The cumulative flip probability for a chain of symmetric flip channels has
the closed form  cum_flip_t = (1 - prod_{s<=t}(1 - 2 beta_s)) / 2, but to
keep float32 parity with the reference's explicit 2x2 matmul chain we
compute it with the same chain (as a ``lax.scan`` over 2x2 matmuls) — it
runs once at setup and is then frozen into the schedule pytree.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Frozen schedule pytree consumed by the diffusion ops.

    Attributes:
      betas: ``[T+1]`` float32, single-step flip probability (index 0 unused
        for sampling; t runs 1..T).
      cum_flip: ``[T+1]`` float32, cumulative flip probability P(x_t != x_0).
      num_timesteps: T (static).
      kind: schedule family name (static).
      exact_posterior: if True, the reverse sampler uses the exact D3PM
        categorical posterior (reference phase 4); if False, the
        predict-x0-and-renoise approximation (reference phases 1–3). Static.
    """

    betas: jax.Array
    cum_flip: jax.Array
    num_timesteps: int = dataclasses.field(metadata=dict(static=True))
    kind: str = dataclasses.field(metadata=dict(static=True))
    exact_posterior: bool = dataclasses.field(metadata=dict(static=True))


def _cumulative_flip_from_chain(betas: jnp.ndarray) -> jnp.ndarray:
    """Off-diagonal of the cumulative product chain Q̄_t = Q_t @ Q̄_{t-1}.

    Float32 2x2 matmul chain mirroring the reference's construction
    (``RQC_dataset_building_phase/diffusion.py:33-43``) so golden tests can
    demand near-bitwise agreement.
    """

    def step(q_bar, beta):
        q_t = jnp.array(
            [[1.0 - beta, beta], [beta, 1.0 - beta]], dtype=jnp.float32
        )
        q_bar = q_t @ q_bar
        return q_bar, q_bar[0, 1]

    eye = jnp.eye(2, dtype=jnp.float32)
    _, offdiag = jax.lax.scan(step, eye, betas[1:])
    return jnp.concatenate([jnp.zeros((1,), jnp.float32), offdiag])


def linear_schedule(num_timesteps: int) -> DiffusionSchedule:
    """Reference phases 1–3 linear schedule.

    ``betas = linspace(0.001, 0.5, T+1)`` float32, applied one-shot (no
    cumulative product): ``cum_flip == betas``
    (cf. ``multi_qubit_any_state/diffusion.py:16-25``).
    """
    betas = jnp.linspace(0.001, 0.5, num_timesteps + 1, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=betas,
        cum_flip=betas,
        num_timesteps=num_timesteps,
        kind="linear",
        exact_posterior=False,
    )


def notebook_schedule(num_timesteps: int) -> DiffusionSchedule:
    """Phase-1 notebook schedule (SimpleMLP/UpgradedMLP runs).

    The notebook builds ``p_stay = linspace(1.0, 0.5, T+1)`` and uses
    ``Q[t] = [[p, 1-p], [1-p, p]]`` directly on x_0 — the same one-shot
    (non-cumulative) semantics as phases 2–3 but with flip probability
    ``betas = 1 - p_stay`` running 0 → 0.5 instead of 0.001 → 0.5
    (reference ``single_qubit_phase/denoising-with-diffusion-phase-1.ipynb``
    cell 6, ``BitstringDDM.__init__``).
    """
    p_stay = jnp.linspace(1.0, 0.5, num_timesteps + 1, dtype=jnp.float32)
    betas = 1.0 - p_stay
    return DiffusionSchedule(
        betas=betas,
        cum_flip=betas,
        num_timesteps=num_timesteps,
        kind="notebook",
        exact_posterior=False,
    )


def cosine_betas(num_timesteps: int) -> np.ndarray:
    """Cosine betas exactly as the reference computes them.

    float64 ᾱ, β_t = min(1 - ᾱ_t/ᾱ_{t-1}, 0.999), β_0 = 0, cast float32
    (cf. ``RQC_dataset_building_phase/diffusion.py:15-31``).
    """
    steps = np.arange(num_timesteps + 1, dtype=np.float64) / num_timesteps
    alpha_bar = np.cos((steps + 0.008) / 1.008 * np.pi / 2) ** 2
    alpha_bar = alpha_bar / alpha_bar[0]
    betas = np.minimum(1.0 - alpha_bar[1:] / alpha_bar[:-1], 0.999)
    return np.concatenate([[0.0], betas]).astype(np.float32)


def cosine_schedule(num_timesteps: int) -> DiffusionSchedule:
    """Reference phase-4 cosine schedule with true cumulative Q̄ chain."""
    betas = jnp.asarray(cosine_betas(num_timesteps))
    return DiffusionSchedule(
        betas=betas,
        cum_flip=_cumulative_flip_from_chain(betas),
        num_timesteps=num_timesteps,
        kind="cosine",
        exact_posterior=True,
    )


def make_schedule(kind: str, num_timesteps: int) -> DiffusionSchedule:
    if kind == "linear":
        return linear_schedule(num_timesteps)
    if kind == "notebook":
        return notebook_schedule(num_timesteps)
    if kind == "cosine":
        return cosine_schedule(num_timesteps)
    raise ValueError(f"unknown schedule kind: {kind!r}")
