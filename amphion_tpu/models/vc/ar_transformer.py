"""Vevo autoregressive transformer: content tokens → content-style tokens.

Same capability as the reference (reference:
`models/vc/autoregressive_transformer/ar_model.py:14` —
`AutoregressiveTransformer` wrapping `LlamaForCausalLM:79`, with an optional
global timbre encoder `global_encoder.py`; used by Vevo-Voice/-Style and, with
phone inputs, Vevo-TTS; trainer `ar_trainer.py`): an input vocabulary
(content tokens at FVQ-32 or phones) is mapped autoregressively to the
content-style vocabulary (FVQ-8192). Rides the shared Llama backbone with a
fixed-size KV cache decode scan.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from amphion_tpu.modules.llama import LlamaConfig, LlamaDecoder
from amphion_tpu.ops.sampling import sample_logits


@dataclass(frozen=True)
class ARTransformerConfig:
    input_vocab: int = 32  # content tokens (or phone vocab for TTS mode)
    output_vocab: int = 8192  # content-style tokens
    hidden: int = 1024
    num_layers: int = 16
    num_heads: int = 16
    max_position: int = 8192
    use_global_timbre: bool = False  # Vevo global timbre encoder option
    timbre_dim: int = 512

    @property
    def bos_id(self) -> int:
        return self.output_vocab

    @property
    def eos_id(self) -> int:
        return self.output_vocab + 1

    remat: bool = False  # rematerialize decoder blocks (memory lever)

    def llama(self) -> LlamaConfig:
        return LlamaConfig(
            hidden_size=self.hidden, num_layers=self.num_layers,
            num_heads=self.num_heads, max_position=self.max_position,
            remat=self.remat,
        )


class GlobalTimbreEncoder(nn.Module):
    """Mean-pooled conv encoder over reference mel → timbre vector
    (ref `models/vc/autoregressive_transformer/global_encoder.py`)."""

    dim: int = 512
    n_mel: int = 80

    @nn.compact
    def __call__(self, ref_mel):
        h = ref_mel
        for i, ch in enumerate([256, 256, self.dim]):
            h = nn.Conv(ch, (5,), strides=(2,), padding="SAME")(h)
            h = nn.gelu(h)
        return jnp.mean(h, axis=1)  # (B, dim)


class ARTransformer(nn.Module):
    cfg: ARTransformerConfig

    def setup(self):
        c = self.cfg
        self.input_embed = nn.Embed(c.input_vocab, c.hidden)
        # +2 for BOS/EOS of the output stream
        self.output_embed = nn.Embed(c.output_vocab + 2, c.hidden)
        self.decoder = LlamaDecoder(c.llama())
        self.head = nn.Dense(c.output_vocab + 2)
        if c.use_global_timbre:
            self.timbre_encoder = GlobalTimbreEncoder(c.hidden)

    def _prefix(self, input_tokens, ref_mel=None):
        pe = self.input_embed(input_tokens)
        if self.cfg.use_global_timbre and ref_mel is not None:
            pe = pe + self.timbre_encoder(ref_mel)[:, None, :]
        return pe

    def forward(self, input_tokens, input_mask, output_tokens, output_mask,
                ref_mel=None):
        """Teacher-forced logits over [inputs; BOS + outputs]."""
        pe = self._prefix(input_tokens, ref_mel)
        bos = jnp.full_like(output_tokens[:, :1], self.cfg.bos_id)
        te = self.output_embed(jnp.concatenate([bos, output_tokens], axis=1))
        x = jnp.concatenate([pe, te], axis=1)
        mask = jnp.concatenate(
            [input_mask, jnp.ones_like(output_mask[:, :1]), output_mask], axis=1
        )
        h = self.decoder(x, mask=mask)
        li = input_tokens.shape[1]
        return self.head(h[:, li:])  # predicts output_tokens then EOS

    def loss(self, input_tokens, input_mask, output_tokens, output_mask,
             ref_mel=None):
        c = self.cfg
        logits = self.forward(input_tokens, input_mask, output_tokens,
                              output_mask, ref_mel)
        targets = jnp.concatenate(
            [output_tokens, jnp.full_like(output_tokens[:, :1], c.eos_id)], axis=1
        )
        w = jnp.concatenate(
            [output_mask, jnp.zeros_like(output_mask[:, :1])], axis=1
        )
        lengths = jnp.sum(output_mask, axis=1).astype(jnp.int32)
        w = w.at[jnp.arange(w.shape[0]), lengths].set(1.0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        loss = -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)
        acc = jnp.sum((logits.argmax(-1) == targets) * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss, {"ar_loss": loss, "ar_acc": acc}

    # -- decode helpers -----------------------------------------------------

    def prefill(self, input_tokens, caches, ref_mel=None):
        pe = self._prefix(input_tokens, ref_mel)
        bos = self.output_embed(
            jnp.full((input_tokens.shape[0], 1), self.cfg.bos_id, jnp.int32)
        )
        x = jnp.concatenate([pe, bos], axis=1)
        h, caches = self.decoder(x, caches=caches, cache_index=0)
        return self.head(h[:, -1]), caches

    def step(self, token, caches, cache_index):
        emb = self.output_embed(token)[:, None, :]
        h, caches = self.decoder(emb, caches=caches, cache_index=cache_index)
        return self.head(h[:, -1]), caches

    def make_cache(self, batch, total_len):
        return self.decoder.init_cache(batch, total_len)


import functools


@functools.lru_cache(maxsize=32)
def _ar_generate_jitted(model, max_new, temperature, top_k, top_p,
                        compute_dtype):
    core = functools.partial(
        _ar_transformer_generate_impl, model, max_new=max_new,
        temperature=temperature, top_k=top_k, top_p=top_p,
        compute_dtype=compute_dtype,
    )
    return jax.jit(core)


def ar_transformer_generate(model, params, input_tokens, rng, max_new=1024,
                            temperature=1.0, top_k=40, top_p=1.0, ref_mel=None,
                            compute_dtype="bfloat16"):
    """KV-cache sampled decode, fully jit-compiled. bf16 by default — the
    token-by-token loop is weight-HBM-bandwidth bound (sampling sees f32
    logits)."""
    return _ar_generate_jitted(model, max_new, temperature, top_k, top_p,
                               compute_dtype)(
        params, input_tokens, rng, ref_mel
    )


def _ar_transformer_generate_impl(
    model: ARTransformer,
    params,
    input_tokens: jax.Array,
    rng: jax.Array,
    ref_mel: jax.Array | None = None,
    max_new: int = 1024,
    temperature: float = 1.0,
    top_k: int = 40,
    top_p: float = 1.0,
    compute_dtype: str = "bfloat16",
):
    """KV-cache sampled decode (ref `ar_model.py:238`), one lax.scan."""
    c = model.cfg
    dt = jnp.dtype(compute_dtype)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params
    )
    if ref_mel is not None:
        ref_mel = ref_mel.astype(dt)
    b, li = input_tokens.shape
    total = li + 1 + max_new
    caches = LlamaDecoder(c.llama()).init_cache(b, total, dtype=dt)
    logits, caches = model.apply(
        {"params": params}, input_tokens, caches, ref_mel, method=ARTransformer.prefill
    )

    def body(carry, i):
        caches, logits, rng, gen_len, done = carry
        rng, r = jax.random.split(rng)
        tok = sample_logits(r, logits.astype(jnp.float32), temperature,
                            top_k, top_p)
        done_new = done | (tok == c.eos_id)
        tok_clean = jnp.where(done_new, 0, tok)
        logits_new, caches_new = model.apply(
            {"params": params}, tok_clean, caches, li + 1 + i,
            method=ARTransformer.step,
        )
        gen_len = jnp.where(done_new, gen_len, i + 1)
        return (caches_new, logits_new, rng, gen_len, done_new), tok_clean

    init = (caches, logits, rng, jnp.zeros((b,), jnp.int32), jnp.zeros((b,), bool))
    (_, _, _, gen_len, _), toks = jax.lax.scan(body, init, jnp.arange(max_new))
    return jnp.moveaxis(toks, 0, 1), gen_len
