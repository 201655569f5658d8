"""TPU-native Whisper ASR: flax decoder + jitted greedy decode.

The reference uses torch Whisper for transcription everywhere it needs
text from audio: WER/CER metrics (`evaluation/metrics/intelligibility/`),
`utils/whisper_transcription.py`, and the Emilia pipeline's ASR stage
(`preprocessors/Emilia/main.py:237`). This module pairs the flax
`WhisperEncoder` (`models/ssl_encoders.py`) with a checkpoint-compatible
decoder (HF `modeling_whisper.py` layout, converted via
`utils/convert.hf_whisper_decoder_to_flax`) and a `lax.scan` greedy
decode with a fixed-size KV cache — one compiled program per
(batch, max_len) bucket, TPU-resident end to end.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.models.ssl_encoders import WhisperEncConfig, WhisperEncoder


@dataclass(frozen=True)
class WhisperDecConfig:
    hidden: int = 512
    num_layers: int = 6
    num_heads: int = 8
    ffn_hidden: int = 2048
    vocab_size: int = 51865
    max_target_positions: int = 448
    layer_norm_eps: float = 1e-5


def _split(x, nh):
    b, t, d = x.shape
    return x.reshape(b, t, nh, d // nh)


class WhisperDecoder(nn.Module):
    """HF `WhisperDecoder`: learned positions, pre-LN blocks of causal
    self-attention + cross-attention over encoder states + MLP, final LN,
    logits tied to the token embedding."""

    cfg: WhisperDecConfig

    def setup(self):
        c = self.cfg
        d = c.hidden
        self.embed_tokens = nn.Embed(c.vocab_size, d)
        self.embed_positions = self.param(
            "embed_positions", nn.initializers.zeros,
            (c.max_target_positions, d))
        # submodule scope names must match the converter's flat layout;
        # setup() derives names from attribute names, so assign via setattr
        for i in range(c.num_layers):
            setattr(self, f"layers_{i}_self_attn_layer_norm",
                    nn.LayerNorm(epsilon=c.layer_norm_eps))
            setattr(self, f"layers_{i}_self_attn_q_proj", nn.Dense(d))
            setattr(self, f"layers_{i}_self_attn_k_proj",
                    nn.Dense(d, use_bias=False))
            setattr(self, f"layers_{i}_self_attn_v_proj", nn.Dense(d))
            setattr(self, f"layers_{i}_self_attn_out_proj", nn.Dense(d))
            setattr(self, f"layers_{i}_encoder_attn_layer_norm",
                    nn.LayerNorm(epsilon=c.layer_norm_eps))
            setattr(self, f"layers_{i}_encoder_attn_q_proj", nn.Dense(d))
            setattr(self, f"layers_{i}_encoder_attn_k_proj",
                    nn.Dense(d, use_bias=False))
            setattr(self, f"layers_{i}_encoder_attn_v_proj", nn.Dense(d))
            setattr(self, f"layers_{i}_encoder_attn_out_proj", nn.Dense(d))
            setattr(self, f"layers_{i}_final_layer_norm",
                    nn.LayerNorm(epsilon=c.layer_norm_eps))
            setattr(self, f"layers_{i}_fc1", nn.Dense(c.ffn_hidden))
            setattr(self, f"layers_{i}_fc2", nn.Dense(d))
        self.layer_norm = nn.LayerNorm(epsilon=c.layer_norm_eps)

    def _sub(self, i, name):
        return getattr(self, f"layers_{i}_{name}")

    def encode_kv(self, enc_states):
        """Per-layer cross-attention (k, v) from encoder states — computed
        once per utterance, reused by every decode step."""
        nh = self.cfg.num_heads
        return [
            (_split(self._sub(i, "encoder_attn_k_proj")(enc_states), nh),
             _split(self._sub(i, "encoder_attn_v_proj")(enc_states), nh))
            for i in range(self.cfg.num_layers)
        ]

    def forward(self, tokens, enc_kv, cache=None, cache_index=None):
        """tokens (B, T) → (logits (B, T, vocab), new_caches). Without
        `cache`: full causal teacher-forcing pass from position 0. With
        `cache`: T new tokens appended at `cache_index`."""
        c = self.cfg
        nh = c.num_heads
        hd = c.hidden // nh
        scale = 1.0 / np.sqrt(hd)
        b, t = tokens.shape
        x = self.embed_tokens(tokens)
        if cache_index is None:
            x = x + self.embed_positions[None, :t]
        else:
            x = x + jax.lax.dynamic_slice_in_dim(
                self.embed_positions, cache_index, t, axis=0)[None]
        new_caches = []
        for i in range(c.num_layers):
            # causal self-attention
            a = self._sub(i, "self_attn_layer_norm")(x)
            q = _split(self._sub(i, "self_attn_q_proj")(a) * scale, nh)
            k = _split(self._sub(i, "self_attn_k_proj")(a), nh)
            v = _split(self._sub(i, "self_attn_v_proj")(a), nh)
            if cache is None:
                scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
                causal = jnp.tril(jnp.ones((t, t), bool))
                scores = jnp.where(causal[None, None], scores,
                                   jnp.finfo(scores.dtype).min)
            else:
                ck, cv = cache[i]  # (B, S, H, hd)
                ck = jax.lax.dynamic_update_slice(
                    ck, k.astype(ck.dtype), (0, cache_index, 0, 0))
                cv = jax.lax.dynamic_update_slice(
                    cv, v.astype(cv.dtype), (0, cache_index, 0, 0))
                new_caches.append((ck, cv))
                scores = jnp.einsum("bqhd,bkhd->bhqk", q, ck)
                slots = jnp.arange(ck.shape[1])
                valid = (slots[None, :]
                         <= (cache_index + jnp.arange(t))[:, None])
                scores = jnp.where(valid[None, None], scores,
                                   jnp.finfo(scores.dtype).min)
                v = cv
            att = nn.softmax(scores, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, t, c.hidden)
            x = x + self._sub(i, "self_attn_out_proj")(o)
            # cross-attention
            cq = _split(self._sub(i, "encoder_attn_q_proj")(
                self._sub(i, "encoder_attn_layer_norm")(x)) * scale, nh)
            ek, ev = enc_kv[i]
            scores = jnp.einsum("bqhd,bkhd->bhqk", cq, ek)
            att = nn.softmax(scores, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", att, ev).reshape(b, t, c.hidden)
            x = x + self._sub(i, "encoder_attn_out_proj")(o)
            # MLP
            f = nn.gelu(self._sub(i, "fc1")(
                self._sub(i, "final_layer_norm")(x)), approximate=False)
            x = x + self._sub(i, "fc2")(f)
        x = self.layer_norm(x)
        logits = self.embed_tokens.attend(x)
        return logits, (new_caches if cache is not None else None)

    def __call__(self, tokens, enc_states):
        """Teacher-forcing convenience: full causal pass, returns logits."""
        return self.forward(tokens, self.encode_kv(enc_states))[0]

    def init_cache(self, batch: int, total_len: int):
        c = self.cfg
        hd = c.hidden // c.num_heads
        return [
            (jnp.zeros((batch, total_len, c.num_heads, hd)),
             jnp.zeros((batch, total_len, c.num_heads, hd)))
            for _ in range(c.num_layers)
        ]


@functools.lru_cache(maxsize=16)
def _greedy_decode_jitted(encoder, decoder, prefix_len, max_new, eot_id):
    @jax.jit
    def run(params, mel, prefix):
        with jax.default_matmul_precision("float32"):
            enc = encoder.apply({"params": params["encoder"]}, mel)
            enc_kv = decoder.apply({"params": params["decoder"]}, enc,
                                   method=WhisperDecoder.encode_kv)
            b = mel.shape[0]
            caches = decoder.init_cache(b, prefix_len + max_new)
            logits, caches = decoder.apply(
                {"params": params["decoder"]}, prefix, enc_kv, caches, 0,
                method=WhisperDecoder.forward)
            tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            done0 = tok0 == eot_id

            def body(carry, step):
                tok, caches, done = carry
                logits, caches = decoder.apply(
                    {"params": params["decoder"]}, tok[:, None], enc_kv,
                    caches, prefix_len + step,
                    method=WhisperDecoder.forward)
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                nxt = jnp.where(done, jnp.int32(eot_id), nxt)
                done = done | (nxt == eot_id)
                return (nxt, caches, done), nxt

            (_, _, _), nxts = jax.lax.scan(
                body, (tok0, caches, done0), jnp.arange(max_new - 1))
            return jnp.concatenate(
                [tok0[:, None], jnp.moveaxis(nxts, 0, 1)], axis=1)

    return run


def whisper_greedy_decode(encoder: WhisperEncoder, decoder: WhisperDecoder,
                          params: dict, mel: jax.Array,
                          forced_prefix, max_new: int = 224,
                          eot_id: int = 50257) -> np.ndarray:
    """Greedy transcription token ids (B, max_new), EOT-padded after the
    stop token. `forced_prefix` = [<sot>, <lang>, <transcribe>,
    <notimestamps>] (HF forced_decoder_ids protocol); `mel` (B, T, n_mel)."""
    b = mel.shape[0]
    prefix = jnp.asarray(np.broadcast_to(
        np.asarray(forced_prefix, np.int32)[None], (b, len(forced_prefix))))
    run = _greedy_decode_jitted(encoder, decoder, int(prefix.shape[1]),
                                int(max_new), int(eot_id))
    return np.asarray(run(params, mel, prefix))


def load_whisper_asr(model_dir: str):
    """(encoder, decoder, params, config dict) from a local HF Whisper
    checkpoint dir (WhisperModel or WhisperForConditionalGeneration)."""
    from amphion_tpu.data.processors.content import _load_hf_dir
    from amphion_tpu.utils.convert import (
        hf_whisper_decoder_to_flax,
        hf_whisper_encoder_to_flax,
    )

    hf, sd = _load_hf_dir(model_dir)
    if any(k.startswith("model.") for k in sd):  # ForConditionalGeneration
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}
    enc_cfg = WhisperEncConfig(
        hidden=hf["d_model"], num_layers=hf["encoder_layers"],
        num_heads=hf["encoder_attention_heads"],
        ffn_hidden=hf["encoder_ffn_dim"], n_mels=hf.get("num_mel_bins", 80),
        max_source_positions=hf.get("max_source_positions", 1500))
    dec_cfg = WhisperDecConfig(
        hidden=hf["d_model"], num_layers=hf["decoder_layers"],
        num_heads=hf["decoder_attention_heads"],
        ffn_hidden=hf["decoder_ffn_dim"], vocab_size=hf["vocab_size"],
        max_target_positions=hf.get("max_target_positions", 448))
    params = {
        "encoder": hf_whisper_encoder_to_flax(
            sd, num_layers=enc_cfg.num_layers),
        "decoder": hf_whisper_decoder_to_flax(
            sd, num_layers=dec_cfg.num_layers),
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return WhisperEncoder(enc_cfg), WhisperDecoder(dec_cfg), params, hf


def whisper_native_transcriber(model_dir: str, language: str = "en",
                               max_new: int = 224):
    """(audio, sr) -> text using the flax encoder+decoder from a local HF
    Whisper dir (tokenizer files must be present — `save_pretrained`
    includes them). Drop-in for `evaluation/metrics/intelligibility.py`'s
    torch transcriber."""
    from transformers import WhisperTokenizer

    from amphion_tpu.data.processors.content import _to_16k
    from amphion_tpu.ops.ssl_frontend import whisper_log_mel

    tok = WhisperTokenizer.from_pretrained(model_dir)
    encoder, decoder, params, hf = load_whisper_asr(model_dir)
    sot = tok.convert_tokens_to_ids("<|startoftranscript|>")
    lang_id = tok.convert_tokens_to_ids(f"<|{language}|>")
    task = tok.convert_tokens_to_ids("<|transcribe|>")
    nots = tok.convert_tokens_to_ids("<|notimestamps|>")
    eot = tok.eos_token_id
    prefix = [t for t in (sot, lang_id, task, nots) if t is not None]
    n_samples = encoder.cfg.max_source_positions * 2 * 160

    def transcribe(audio, sample_rate=16000) -> str:
        x = _to_16k(audio, sample_rate)
        buf = np.zeros((1, n_samples), np.float32)
        buf[0, :min(len(x), n_samples)] = x[:n_samples]
        mel = whisper_log_mel(jnp.asarray(buf), n_mels=encoder.cfg.n_mels)
        ids = whisper_greedy_decode(encoder, decoder, params,
                                    mel.transpose(0, 2, 1), prefix,
                                    max_new=max_new, eot_id=eot)[0]
        ids = ids[ids != eot]
        return tok.decode(ids, skip_special_tokens=True).strip()

    return transcribe
