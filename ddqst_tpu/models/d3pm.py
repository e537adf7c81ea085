"""FiLM-conditioned residual-MLP denoiser (the reference's backbone family).

Covers both reference variants behind one ``input_encoding`` switch:

- ``"float"`` — bits cast to float and projected ``Dense(N -> H)``
  (reference phases 2-3, ``multi_qubit_any_state/model.py:56,69-70``).
- ``"token"`` — per-bit embedding ``Embed(2, E)`` flattened to ``[B, N·E]``
  then projected (reference phase 4, ``RQC_dataset_building_phase/
  model.py:32,55-57``).

Conditioning: time embedding ``Embed(T+1, E)`` and basis embedding
``Embed(3^N, E)`` concatenated into a ``2E`` conditioning vector feeding a
FiLM layer per residual block — ``x * (1 + γ) + β`` then
Dense→SiLU→Dense with a SiLU'd residual (``model.py:5-40``).

TPU notes: hidden_dim defaults to 512 (4×128 lanes — MXU-aligned); compute
dtype is switchable to bfloat16 (params stay float32). The whole forward is
8 small matmuls + elementwise — XLA fuses the FiLM/SiLU chains into the
matmuls; a fully-fused Pallas kernel for the sampler's forward lives in
:mod:`ddqst_tpu.ops.pallas_kernels`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ddqst_tpu.config import ModelConfig


class FiLMResBlock(nn.Module):
    """Residual block with feature-wise linear modulation.

    Mirrors reference ``FiLM`` + ``ResBlock`` (``model.py:5-40``): the
    conditioning vector produces per-feature (γ, β) from one Dense layer.
    """

    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        gamma_beta = nn.Dense(2 * self.hidden_dim, dtype=self.dtype,
                              name="film")(cond)
        gamma, beta = jnp.split(gamma_beta, 2, axis=-1)
        h = x * (1.0 + gamma) + beta
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.silu(h)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(h)
        return nn.silu(x + h)


class ConditionalD3PM(nn.Module):
    """Basis- and time-conditioned bitstring denoiser.

    ``__call__(x_t [B,N] int, t [B] int, basis_idx [B] int) -> logits
    [B,N,2]`` — same signature/semantics as the reference
    (``multi_qubit_any_state/model.py:68-85``).
    """

    num_qubits: int
    num_bases: int
    num_timesteps: int
    embed_dim: int = 64
    hidden_dim: int = 512
    num_blocks: int = 4
    input_encoding: str = "float"  # 'float' | 'token'
    # Beyond-reference: optional circuit-identity conditioning. The
    # reference's phase-4 protocol trains one model over many circuits with
    # only (t, basis) conditioning, so it can only learn their *average*
    # distribution (its per-circuit evaluate fidelities are structurally
    # low). With num_circuits > 0, ``basis_idx`` may be a packed ``[B, 2]``
    # array of (basis_idx, circuit_idx) and a circuit embedding joins the
    # conditioning vector — enabling true per-circuit reconstruction.
    num_circuits: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, basis_idx):
        b = x.shape[0]
        circuit_idx = None
        if basis_idx.ndim == 2:
            basis_idx, circuit_idx = basis_idx[..., 0], basis_idx[..., 1]
        if self.input_encoding == "float":
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="input_proj")(
                x.astype(self.dtype)
            )
        elif self.input_encoding == "token":
            emb = nn.Embed(2, self.embed_dim, dtype=self.dtype, name="x_emb")(x)
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="input_proj")(
                emb.reshape(b, self.num_qubits * self.embed_dim)
            )
        else:
            raise ValueError(f"bad input_encoding {self.input_encoding!r}")

        t_emb = nn.Embed(self.num_timesteps + 1, self.embed_dim,
                         dtype=self.dtype, name="time_emb")(t)
        b_emb = nn.Embed(self.num_bases, self.embed_dim, dtype=self.dtype,
                         name="basis_emb")(basis_idx)
        parts = [t_emb, b_emb]
        if self.num_circuits > 0:
            if circuit_idx is None:
                circuit_idx = jnp.zeros_like(basis_idx)
            parts.append(
                nn.Embed(self.num_circuits, self.embed_dim, dtype=self.dtype,
                         name="circuit_emb")(circuit_idx)
            )
        cond = jnp.concatenate(parts, axis=-1)

        for i in range(self.num_blocks):
            h = FiLMResBlock(self.hidden_dim, dtype=self.dtype,
                             name=f"block_{i}")(h, cond)

        out = nn.Dense(self.num_qubits * 2, dtype=self.dtype,
                       name="output_head")(h)
        return out.reshape(b, self.num_qubits, 2).astype(jnp.float32)


class PlainMLP(nn.Module):
    """The phase-1 notebook MLP family (``SimpleMLP`` / ``UpgradedMLP``).

    ``concat(float bits, time_emb, basis_emb)`` → ``num_blocks`` ×
    [Dense(H), ReLU] → Dense(N·2) logits — no FiLM, no residuals
    (reference ``single_qubit_phase/denoising-with-diffusion-phase-1.ipynb``
    cell 6 ``SimpleMLP``: embed 32, hidden 128, 2 hidden layers; cell 12
    ``UpgradedMLP``: embed 128, hidden 256, 3 hidden layers). Generalised
    from the notebook's single bit to N-qubit bitstrings the same way the
    reference's own phase-2 model generalised it (float-bit projection).
    """

    num_qubits: int
    num_bases: int
    num_timesteps: int
    embed_dim: int = 32
    hidden_dim: int = 128
    num_blocks: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, basis_idx):
        b = x.shape[0]
        if basis_idx.ndim == 2:  # packed (basis, circuit) — no circuit emb
            basis_idx = basis_idx[..., 0]
        t_emb = nn.Embed(self.num_timesteps + 1, self.embed_dim,
                         dtype=self.dtype, name="time_emb")(t)
        b_emb = nn.Embed(self.num_bases, self.embed_dim, dtype=self.dtype,
                         name="basis_emb")(basis_idx)
        h = jnp.concatenate([x.astype(self.dtype), t_emb, b_emb], axis=-1)
        for i in range(self.num_blocks):
            h = nn.relu(
                nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"fc_{i}")(h)
            )
        out = nn.Dense(self.num_qubits * 2, dtype=self.dtype,
                       name="output_head")(h)
        return out.reshape(b, self.num_qubits, 2).astype(jnp.float32)


def build_model(
    cfg: ModelConfig, num_qubits: int, num_timesteps: int,
    num_circuits: int = 0,
) -> nn.Module:
    """Instantiate a denoiser from a :class:`ModelConfig`.

    ``num_circuits > 0`` enables circuit-identity conditioning (film_mlp
    only; see :class:`ConditionalD3PM`).
    """
    dtype = jnp.dtype(cfg.dtype)
    if cfg.arch == "film_mlp":
        return ConditionalD3PM(
            num_qubits=num_qubits,
            num_bases=3**num_qubits,
            num_timesteps=num_timesteps,
            embed_dim=cfg.embed_dim,
            hidden_dim=cfg.hidden_dim,
            num_blocks=cfg.num_blocks,
            input_encoding=cfg.input_encoding,
            num_circuits=num_circuits,
            dtype=dtype,
        )
    if cfg.arch == "plain_mlp":
        if num_circuits > 0:
            raise ValueError("plain_mlp does not support circuit conditioning")
        return PlainMLP(
            num_qubits=num_qubits,
            num_bases=3**num_qubits,
            num_timesteps=num_timesteps,
            embed_dim=cfg.embed_dim,
            hidden_dim=cfg.hidden_dim,
            num_blocks=cfg.num_blocks,
            dtype=dtype,
        )
    if cfg.arch == "transformer":
        from ddqst_tpu.models.transformer import TransformerDenoiser

        return TransformerDenoiser(
            num_qubits=num_qubits,
            num_timesteps=num_timesteps,
            embed_dim=cfg.embed_dim,
            hidden_dim=cfg.hidden_dim,
            num_blocks=cfg.num_blocks,
            num_heads=cfg.num_heads,
            dtype=dtype,
        )
    raise ValueError(f"unknown arch {cfg.arch!r}")
