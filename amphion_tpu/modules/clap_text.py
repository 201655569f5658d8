"""CLAP text tower (flax) — the last reference conditioning encoder.

The reference's PicoAudio vendors a full CLAP
(`models/tta/picoaudio/picoaudio/audioldm/clap/open_clip/model.py`) and
its ClapText variant conditions generation on CLAP *text* embeddings
(`controllable_diffusion.py:349` — the embedding arrives precomputed as
``event_info``). This module is the native encoder that PRODUCES those
embeddings: the open_clip "transformer" text branch
(`model.py:476-497,619-636`):

    token_embedding + positional_embedding
    -> N pre-LN residual attention blocks (causal mask, GELU 4x MLP)
    -> ln_final
    -> pool at the EOT position (argmax of token ids — EOT is the
       highest id in the CLIP BPE vocab)
    -> text_projection: Linear(width->joint) -> act -> Linear(joint->joint)
    -> L2 normalize (`model.py:751` get_text_embedding)

Checkpoint-compatible with the vendored torch CLAP via
`utils/convert.py:clap_text_to_flax` (torch oracle:
tests/test_clap_text.py loads the reference module by file path).

A native CLIP BPE tokenizer (`ClapBPETokenizer`) reproduces the
reference's `tokenizer.py` given a user-supplied
``bpe_simple_vocab_16e6.txt.gz`` path (zero-egress: nothing is
downloaded; the reference applies `ftfy.fix_text` first — absent here,
a no-op for well-formed input and documented as the only deviation).
"""

from __future__ import annotations

import dataclasses
import functools
import gzip
import html

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ClapTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    joint_embed: int = 512  # CLAP joint_embed_shape (model.py:441)
    quick_gelu: bool = False  # RN*/ViT*-quickgelu model configs
    mlp_act: str = "relu"  # projection activation (model.py:453-458)


def _gelu(x, quick: bool):
    # torch nn.GELU is the exact erf form; QuickGELU = x*sigmoid(1.702x)
    if quick:
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


class _ResidualAttentionBlock(nn.Module):
    """open_clip `ResidualAttentionBlock` (model.py:259-283): pre-LN,
    packed-QKV MultiheadAttention, 4x GELU MLP."""

    cfg: ClapTextConfig

    @nn.compact
    def __call__(self, x, attn_bias):
        c = self.cfg
        b, l, w = x.shape
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * w, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = w // c.heads

        def heads(t):
            return t.reshape(b, l, c.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd)
        scores = scores + attn_bias  # additive -inf causal mask
        att = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, w)
        x = x + nn.Dense(w, name="out_proj")(o)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * w, name="c_fc")(h)
        h = _gelu(h, c.quick_gelu)
        x = x + nn.Dense(w, name="c_proj")(h)
        return x


class ClapTextEncoder(nn.Module):
    """open_clip CLAP text branch + projection; `__call__` maps token
    ids (B, L<=context_length) to (B, joint_embed) embeddings."""

    cfg: ClapTextConfig

    @nn.compact
    def __call__(self, tokens, normalize: bool = True):
        c = self.cfg
        b, l = tokens.shape
        x = nn.Embed(c.vocab_size, c.width, name="token_embedding")(tokens)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01), (c.context_length, c.width))
        x = x + pos[None, :l]
        # causal additive mask (model.py:612-617 build_attention_mask)
        bias = jnp.triu(jnp.full((l, l), -jnp.inf), k=1)[None, None]
        for i in range(c.layers):
            x = _ResidualAttentionBlock(c, name=f"block_{i}")(x, bias)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # EOT pooling: argmax of ids — EOT is the vocab's highest id
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(b), eot]
        h = nn.Dense(c.joint_embed, name="proj_fc1")(pooled)
        h = (_gelu(h, False) if c.mlp_act == "gelu" else nn.relu(h))
        h = nn.Dense(c.joint_embed, name="proj_fc2")(h)
        if normalize:
            h = h / jnp.maximum(
                jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
        return h


@functools.lru_cache(maxsize=4)
def _clap_text_jitted(model):
    return jax.jit(lambda p, t: model.apply({"params": p}, t))


def clap_text_embed(model: ClapTextEncoder, params, tokens) -> jax.Array:
    """Jitted (B, L) token ids -> (B, joint_embed) normalized embeds."""
    return _clap_text_jitted(model)(params, jnp.asarray(tokens))


# ---------------------------------------------------------------------------
# Native CLIP BPE tokenizer (reference tokenizer.py; vocab supplied by path)
# ---------------------------------------------------------------------------


def _bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, (chr(x) for x in cs)))


class ClapBPETokenizer:
    """CLIP SimpleTokenizer rebuilt natively (reference
    `open_clip/tokenizer.py:75-162`): byte-level BPE over the public
    ``bpe_simple_vocab_16e6.txt.gz`` merges file, lower-cased, with
    `<start_of_text>`/`<end_of_text>` specials. The reference runs
    `ftfy.fix_text` before cleaning — unavailable here (zero extra
    deps); a no-op for well-formed text."""

    def __init__(self, bpe_path: str):
        import regex as re

        self.byte_encoder = _bytes_to_unicode()
        merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        merges = [tuple(m.split()) for m in merges[1: 49152 - 256 - 2 + 1]]
        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += ["<start_of_text>", "<end_of_text>"]
        self.encoder = {t: i for i, t in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {"<start_of_text>": "<start_of_text>",
                      "<end_of_text>": "<end_of_text>"}
        self.pat = re.compile(
            r"<start_of_text>|<end_of_text>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+", re.IGNORECASE)
        self.sot = self.encoder["<start_of_text>"]
        self.eot = self.encoder["<end_of_text>"]

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        if len(word) == 1:
            return token + "</w>"
        while True:
            pairs = {(a, b) for a, b in zip(word[:-1], word[1:])}
            bigram = min(pairs,
                         key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            out, i = [], 0
            while i < len(word):
                if (word[i] == first and i < len(word) - 1
                        and word[i + 1] == second):
                    out.append(first + second)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
            if len(word) == 1:
                break
        res = " ".join(word)
        self.cache[token] = res
        return res

    def encode(self, text: str) -> list[int]:
        import regex as re

        text = html.unescape(html.unescape(text)).strip()
        text = re.sub(r"\s+", " ", text).strip().lower()
        ids: list[int] = []
        for token in self.pat.findall(text):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids

    def __call__(self, texts, context_length: int = 77):
        import numpy as np

        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot] + self.encode(t) + [self.eot]
            ids = ids[:context_length]
            out[i, :len(ids)] = ids
        return out
