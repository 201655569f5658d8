"""Vector quantization family: VQ, factorized VQ, residual VQ, lookup-free Q.

Covers the reference quantizer surface (reference:
`models/codec/amphion_codec/quantize/vector_quantize.py:76,258`,
`factorized_vector_quantize.py:22`, `residual_vq.py:22`,
`lookup_free_quantize.py:22`) with a functional design: codebooks are
parameters trained with straight-through estimators + commitment/codebook
losses (the JAX-native equivalent of the reference's EMA/Adam mix), and all
lookups are one-hot matmuls — argmin + gather-free on the MXU.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _st(quantized: jax.Array, x: jax.Array) -> jax.Array:
    """Straight-through estimator."""
    return x + jax.lax.stop_gradient(quantized - x)


def _nearest(x: jax.Array, codebook: jax.Array) -> jax.Array:
    """Nearest codebook indices. x (..., D), codebook (K, D) → (...)."""
    # ||x - c||^2 = ||x||^2 - 2 x·c + ||c||^2 ; argmin over c
    dots = jnp.einsum("...d,kd->...k", x, codebook)
    c2 = jnp.sum(codebook**2, axis=-1)
    return jnp.argmin(c2[None] - 2.0 * dots.reshape(-1, codebook.shape[0]), axis=-1).reshape(x.shape[:-1])


class VectorQuantize(nn.Module):
    """Plain VQ with commitment + codebook losses (ref `vector_quantize.py:76`)."""

    codebook_size: int
    codebook_dim: int
    commitment: float = 0.25

    def setup(self):
        self.codebook = self.param(
            "codebook",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (self.codebook_size, self.codebook_dim),
        )

    def __call__(self, x):
        """x (B, T, D) → (quantized, indices, loss_dict)."""
        idx = _nearest(jax.lax.stop_gradient(x), self.codebook)
        q = self.decode(idx)
        commit = jnp.mean((x - jax.lax.stop_gradient(q)) ** 2)
        codebook_loss = jnp.mean((jax.lax.stop_gradient(x) - q) ** 2)
        out = _st(q, x)
        return out, idx, {
            "vq_commit": self.commitment * commit,
            "vq_codebook": codebook_loss,
        }

    def encode(self, x):
        return _nearest(x, self.codebook)

    def decode(self, idx):
        return jnp.take(self.codebook, idx, axis=0)


class FactorizedVectorQuantize(nn.Module):
    """FVQ: project into a low-dim codebook space, optionally L2-normalized
    *lookup* (ref `factorized_vector_quantize.py:22`; the Coco/Vevo
    tokenizers and the MaskGCT acoustic codec).

    Reference semantics exactly: with ``use_l2_normlize`` the nearest-
    neighbor search runs on normalized latents/codebook (cosine distance),
    but the quantized value is the RAW codebook entry (ref
    `decode_latents`/`decode_code` at factorized_vector_quantize.py:103-121
    — normalization affects the lookup only), the straight-through estimator
    anchors on the unnormalized projected latent, and losses are plain MSE
    between latent and entry."""

    codebook_size: int
    codebook_dim: int  # low-dim lookup space
    input_dim: int
    commitment: float = 0.25
    use_l2_normlize: bool = True  # MaskGCT/Coco configs set true

    def setup(self):
        self.in_proj = nn.Dense(self.codebook_dim, name="in_proj")
        self.out_proj = nn.Dense(self.input_dim, name="out_proj")
        self.codebook = self.param(
            "codebook",
            nn.initializers.normal(1.0),
            (self.codebook_size, self.codebook_dim),
        )

    def _lookup(self, z):
        if self.use_l2_normlize:
            enc = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
            cb = self.codebook / (
                jnp.linalg.norm(self.codebook, axis=-1, keepdims=True) + 1e-8
            )
        else:
            enc, cb = z, self.codebook
        return _nearest(jax.lax.stop_gradient(enc), cb)

    def __call__(self, x):
        z = self.in_proj(x)
        idx = self._lookup(z)
        zq = jnp.take(self.codebook, idx, axis=0)  # raw entries
        commit = jnp.mean((z - jax.lax.stop_gradient(zq)) ** 2)
        codebook_loss = jnp.mean((jax.lax.stop_gradient(z) - zq) ** 2)
        zq = _st(zq, z)
        out = self.out_proj(zq)
        return out, idx, {
            "vq_commit": self.commitment * commit,
            "vq_codebook": codebook_loss,
        }

    def encode(self, x):
        return self._lookup(self.in_proj(x))

    def decode(self, idx):
        return self.out_proj(jnp.take(self.codebook, idx, axis=0))


class ResidualVQ(nn.Module):
    """Residual VQ stack with quantizer dropout (ref `residual_vq.py:22`)."""

    num_quantizers: int
    codebook_size: int
    codebook_dim: int
    input_dim: int
    quantizer_type: str = "fvq"  # "vq" | "fvq"
    commitment: float = 0.25
    dropout: bool = True  # random active-quantizer count during training

    def setup(self):
        if self.quantizer_type == "fvq":
            self.quantizers = [
                FactorizedVectorQuantize(
                    self.codebook_size, self.codebook_dim, self.input_dim,
                    self.commitment, name=f"q{i}",
                )
                for i in range(self.num_quantizers)
            ]
        else:
            self.quantizers = [
                VectorQuantize(self.codebook_size, self.codebook_dim,
                               self.commitment, name=f"q{i}")
                for i in range(self.num_quantizers)
            ]

    def __call__(self, x, train: bool = False, rng: Optional[jax.Array] = None):
        """x (B, T, D) → (quantized, indices (Q, B, T), losses)."""
        residual = x
        out = jnp.zeros_like(x)
        all_idx = []
        losses = {"vq_commit": 0.0, "vq_codebook": 0.0}
        if train and self.dropout and rng is not None:
            n_active = jax.random.randint(rng, (), 1, self.num_quantizers + 1)
        else:
            n_active = self.num_quantizers
        for qi, q in enumerate(self.quantizers):
            zq, idx, ld = q(residual)
            active = qi < n_active
            w = jnp.asarray(active, x.dtype)
            out = out + w * zq
            residual = residual - jax.lax.stop_gradient(zq) * w
            for k in ld:
                losses[k] = losses[k] + ld[k] * w
            all_idx.append(idx)
        return out, jnp.stack(all_idx), losses

    def decode(self, indices):
        """(Q, B, T) codes → (B, T, D)."""
        out = None
        for qi, q in enumerate(self.quantizers):
            dec = q.decode(indices[qi])
            out = dec if out is None else out + dec
        return out


class LookupFreeQuantize(nn.Module):
    """LFQ: sign-bit quantization to {-1, 1}^D (ref `lookup_free_quantize.py:22`)."""

    codebook_dim: int  # bits; codebook_size = 2**bits
    input_dim: int
    commitment: float = 0.25
    entropy_weight: float = 0.1

    def setup(self):
        self.in_proj = nn.Dense(self.codebook_dim, name="in_proj")
        self.out_proj = nn.Dense(self.input_dim, name="out_proj")

    def __call__(self, x):
        z = self.in_proj(x)
        q = jnp.where(z > 0, 1.0, -1.0)
        idx = jnp.sum(
            (q > 0).astype(jnp.int32)
            * (2 ** jnp.arange(self.codebook_dim, dtype=jnp.int32)),
            axis=-1,
        )
        commit = jnp.mean((z - jax.lax.stop_gradient(q)) ** 2)
        # per-bit entropy regularization: encourage each bit to be used 50/50
        p = jnp.mean(jax.nn.sigmoid(2.0 * z), axis=tuple(range(z.ndim - 1)))
        usage_entropy = -jnp.mean(
            p * jnp.log(p + 1e-8) + (1 - p) * jnp.log(1 - p + 1e-8)
        )
        zq = _st(q, z)
        out = self.out_proj(zq)
        return out, idx, {
            "vq_commit": self.commitment * commit,
            "vq_entropy": -self.entropy_weight * usage_entropy,
        }
