"""Transformer denoiser for large qubit counts (shadow-tomography scale).

The reference's FiLM MLP conditions on a *global* basis index with an
``Embed(3^N, E)`` table (``model.py:53``) — infeasible beyond N≈12. This
model treats the N-qubit bitstring as a length-N token sequence and
conditions *per qubit*: each token is bit-embedding + basis-character
embedding (X/Y/Z, vocab 3) + learned position, so the parameter count is
independent of 3^N. This is the BASELINE.json config-5 stretch model
("N=10+ qubit transformer denoiser vs ShadowGPT") and pairs with the shadow
basis-capping dataset builders (reference ``build_dataset.py:69-87``).

Conditioning on the timestep uses FiLM on each block's inputs (same
modulation family as the MLP backbone, keeping one conditioning idiom
across the framework).

Sharding intent (see :mod:`ddqst_tpu.parallel.mesh`): attention heads and
MLP hidden dim shard over the ``model`` mesh axis; batch over ``data``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def basis_idx_to_labels(basis_idx: jnp.ndarray, num_qubits: int) -> jnp.ndarray:
    """Global basis index -> per-qubit labels [. .., N] (0=X,1=Y,2=Z).

    Inverts the canonical ``itertools.product`` enumeration (qubit 0 is the
    most-significant base-3 digit).
    """
    powers = 3 ** jnp.arange(num_qubits - 1, -1, -1, dtype=basis_idx.dtype)
    return (basis_idx[..., None] // powers) % 3


def labels_to_basis_idx(labels: jnp.ndarray) -> jnp.ndarray:
    n = labels.shape[-1]
    powers = 3 ** jnp.arange(n - 1, -1, -1, dtype=labels.dtype)
    return jnp.sum(labels * powers, axis=-1)


class TransformerBlock(nn.Module):
    embed_dim: int
    hidden_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, cond):
        # FiLM from the time conditioning vector, applied pre-attention.
        gb = nn.Dense(2 * self.embed_dim, dtype=self.dtype, name="film")(cond)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        x = nn.LayerNorm(dtype=self.dtype, name="ln1")(h)
        x = x * (1.0 + gamma[:, None, :]) + beta[:, None, :]
        x = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(x, x)
        h = h + x
        y = nn.LayerNorm(dtype=self.dtype, name="ln2")(h)
        y = nn.Dense(self.hidden_dim, dtype=self.dtype, name="mlp1")(y)
        y = nn.silu(y)
        y = nn.Dense(self.embed_dim, dtype=self.dtype, name="mlp2")(y)
        return h + y


class TransformerDenoiser(nn.Module):
    """``__call__(x [B,N], t [B], basis [B] or [B,N]) -> logits [B,N,2]``.

    ``basis`` may be a global basis index (converted internally; valid while
    3^N fits an int32, N ≤ 19) or per-qubit labels ``[B, N]`` — the native
    form for shadow-sampled datasets at large N.
    """

    num_qubits: int
    num_timesteps: int
    embed_dim: int = 128
    hidden_dim: int = 512
    num_blocks: int = 4
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, basis):
        if basis.ndim == x.ndim - 1:
            basis = basis_idx_to_labels(basis, self.num_qubits)
        h = (
            nn.Embed(2, self.embed_dim, dtype=self.dtype, name="bit_emb")(x)
            + nn.Embed(3, self.embed_dim, dtype=self.dtype, name="basis_emb")(basis)
            + self.param(
                "pos_emb",
                nn.initializers.normal(0.02),
                (self.num_qubits, self.embed_dim),
            ).astype(self.dtype)
        )
        cond = nn.Embed(
            self.num_timesteps + 1, self.embed_dim, dtype=self.dtype,
            name="time_emb",
        )(t)
        for i in range(self.num_blocks):
            h = TransformerBlock(
                self.embed_dim, self.hidden_dim, self.num_heads,
                dtype=self.dtype, name=f"block_{i}",
            )(h, cond)
        h = nn.LayerNorm(dtype=self.dtype, name="ln_f")(h)
        out = nn.Dense(2, dtype=self.dtype, name="output_head")(h)
        return out.astype(jnp.float32)
