"""Native polyphone-disambiguation model (the role the reference fills
with an ONNX BERT over 159 polychars / 391 readings,
`models/tts/maskgct/g2p/g2p/chinese_model_g2p.py` + the
`g2p_chinese_model/{polychar.txt,polydict.json}` class map).

A context classifier over features that GENERALIZE to unseen words
(round-5 upgrade; the original hashed-char window could only memorize
word identities, measured 0.50 held-out):

- hashed char-window embeddings (±W, position-tagged) — word-identity
  signal for in-vocabulary contexts;
- **phonological window**: each context char's default reading from the
  3,531-char table, embedded as (initial, final, tone) — generalizes to
  unseen neighbor characters through their phonology (and captures
  sandhi-style dependencies like 一/不 on the following tone);
- **word-position features**: where the target char sits inside its
  segmented word (single/begin/middle/end + clipped offsets) — the
  neutral-tone and grammatical readings (子5, 了le5, 地de5…) are
  position-conditioned;
- **table-default prior**: an indicator over the candidate readings
  marking the char's default from `CHAR_PINYIN`, mixed into the logits
  through a learned scale — the per-char prior needs no training
  examples of that char, so rare chars fall back gracefully.

Predictions are masked to the target char's candidate readings from
`polyphone_inventory.INVENTORY`. The model backs up the rule+lexicon
layer for out-of-lexicon contexts; training data is generated from the
realization lexicons (`polyphone_dataset`), and the test bar is an
ABSOLUTE held-out-word accuracy (tests/test_polyphone_inventory.py),
not a delta over the majority baseline.
"""

from __future__ import annotations

import hashlib

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from amphion_tpu.text.multilingual.polyphone_inventory import INVENTORY

WINDOW = 4  # context chars each side
N_BUCKETS = 4096

# global reading vocabulary (stable order)
READINGS: tuple[str, ...] = tuple(sorted({
    r for rs in INVENTORY.values() for r in rs}))
READING_ID = {r: i for i, r in enumerate(READINGS)}

# per-char candidate masks
_CHAR_MASK = {
    c: np.array([1.0 if r in rs else 0.0 for r in READINGS], np.float32)
    for c, rs in INVENTORY.items()
}


def _phono_tables():
    """Stable (initial→id, final→id) maps covering the pinyin table and
    every inventory reading (0 = pad/unknown)."""
    from amphion_tpu.text.multilingual.mandarin import (
        CHAR_PINYIN,
        parse_pinyin,
    )

    inits, finals = set(), set()
    for syl in list(CHAR_PINYIN.values()) + list(READINGS):
        p = parse_pinyin(syl.split()[0])
        if p:
            inits.add(p[0])
            finals.add(p[1])
    ini = {s: i + 1 for i, s in enumerate(sorted(inits))}
    fin = {s: i + 1 for i, s in enumerate(sorted(finals))}
    return ini, fin


_INI_ID, _FIN_ID = None, None


def _phono_of(ch: str) -> tuple[int, int, int]:
    """(initial_id, final_id, tone) of the char's DEFAULT table reading;
    zeros for non-hanzi/unknown."""
    global _INI_ID, _FIN_ID
    from amphion_tpu.text.multilingual.mandarin import (
        CHAR_PINYIN,
        parse_pinyin,
    )

    if _INI_ID is None:
        _INI_ID, _FIN_ID = _phono_tables()
    syl = CHAR_PINYIN.get(ch)
    if not syl:
        return 0, 0, 0
    p = parse_pinyin(syl.split()[0])
    if not p:
        return 0, 0, 0
    return _INI_ID.get(p[0], 0), _FIN_ID.get(p[1], 0), p[2]


N_INITIALS = 32  # embedding table sizes (>= live ids)
N_FINALS = 64


def char_bucket(ch: str) -> int:
    """Stable hash bucket for a character (0 reserved for padding)."""
    h = int.from_bytes(hashlib.sha1(ch.encode()).digest()[:4], "little")
    return 1 + h % (N_BUCKETS - 1)


def encode_context(text: str, idx: int,
                   word_span: tuple[int, int] | None = None):
    """Feature dict for the polychar at ``text[idx]``:

    ctx (2W+1,) int32 hashed char ids; phono (2W+1, 3) int32
    (initial, final, tone) of each window char's default reading;
    wordpos (6,) float32 [single, begin, middle, end, off_from_start,
    off_from_end] for the target inside ``word_span`` (defaults to the
    whole text — the no-segmentation fallback)."""
    ctx = np.zeros(2 * WINDOW + 1, np.int32)
    phono = np.zeros((2 * WINDOW + 1, 3), np.int32)
    for k in range(-WINDOW, WINDOW + 1):
        j = idx + k
        if 0 <= j < len(text):
            ctx[k + WINDOW] = char_bucket(text[j])
            phono[k + WINDOW] = _phono_of(text[j])
    s, e = word_span if word_span is not None else (0, len(text))
    first, last = idx == s, idx == e - 1
    wordpos = np.array([
        float(first and last), float(first and not last),
        float(not first and not last), float(last and not first),
        min(idx - s, 3) / 3.0, min(e - 1 - idx, 3) / 3.0,
    ], np.float32)
    return ctx, phono, wordpos


def _default_onehot(ch: str) -> np.ndarray:
    """(R,) indicator of the char's table-default reading among the
    global reading vocabulary (all-zero if the default is not an
    inventory reading)."""
    from amphion_tpu.text.multilingual.mandarin import CHAR_PINYIN

    v = np.zeros(len(READINGS), np.float32)
    syl = (CHAR_PINYIN.get(ch) or "").split()
    if syl and syl[0] in READING_ID:
        v[READING_ID[syl[0]]] = 1.0
    return v


class PolyphoneClassifier(nn.Module):
    embed_dim: int = 48
    phono_dim: int = 12
    hidden: int = 256

    @nn.compact
    def __call__(self, ctx_ids, phono, wordpos, default_1h, cand_mask):
        """ctx_ids (B, 2W+1); phono (B, 2W+1, 3); wordpos (B, 6);
        default_1h (B, R); cand_mask (B, R) → logits (B, R)."""
        emb = nn.Embed(N_BUCKETS, self.embed_dim, name="chars")(ctx_ids)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (2 * WINDOW + 1, self.embed_dim))
        emb = emb + pos[None]
        pe = jnp.concatenate([
            nn.Embed(N_INITIALS, self.phono_dim, name="ini")(phono[..., 0]),
            nn.Embed(N_FINALS, self.phono_dim, name="fin")(phono[..., 1]),
            nn.Embed(6, self.phono_dim, name="tone")(phono[..., 2]),
        ], axis=-1)
        flat = jnp.concatenate(
            [emb.reshape(emb.shape[0], -1), pe.reshape(pe.shape[0], -1),
             wordpos], axis=-1)
        h = nn.relu(nn.Dense(self.hidden, name="fc1")(flat))
        logits = nn.Dense(len(READINGS), name="out")(h)
        # learned mix-in of the per-char table prior: readings with no
        # training support stay reachable through their default status
        alpha = self.param("default_scale", nn.initializers.ones, ())
        logits = logits + alpha * default_1h
        return jnp.where(cand_mask > 0, logits, -1e9)


def polyphone_dataset(word_lexicons: list[dict[str, str]],
                      templates: tuple[str, ...] = (
                          "我们{W}以后", "这个{W}真的", "他说{W}了吗",
                          "关于{W}的事", "{W}", "就是{W}而已",
                          "昨天{W}今天", "因为{W}所以"),
                      ) -> list[tuple]:
    """(sentence, polychar index, char, reading, word_span) samples from
    every lexicon word containing an inventory char, embedded in neutral
    sentence templates (the polychar's reading is word-internal, so the
    templates vary the window without changing the label)."""
    samples = []
    for lex in word_lexicons:
        for word, py in lex.items():
            syls = py.split()
            if len(syls) != len(word):
                continue
            for ci, (ch, r) in enumerate(zip(word, syls)):
                if ch in INVENTORY and r in INVENTORY[ch]:
                    for t in templates:
                        sent = t.replace("{W}", word)
                        w0 = sent.index(word)
                        samples.append((sent, w0 + ci, ch, r,
                                        (w0, w0 + len(word))))
    return samples


def build_arrays(samples):
    feats = [encode_context(s[0], s[1],
                            s[4] if len(s) > 4 else None)
             for s in samples]
    ctx = np.stack([f[0] for f in feats])
    phono = np.stack([f[1] for f in feats])
    wordpos = np.stack([f[2] for f in feats])
    default = np.stack([_default_onehot(s[2]) for s in samples])
    mask = np.stack([_CHAR_MASK[s[2]] for s in samples])
    y = np.array([READING_ID[s[3]] if s[3] is not None else 0
                  for s in samples], np.int32)
    return ctx, phono, wordpos, default, mask, y


def train_classifier(samples, steps: int = 300, lr: float = 3e-3,
                     batch: int = 256, seed: int = 0):
    """Fit on generated samples; returns (module, params)."""
    import optax

    model = PolyphoneClassifier()
    ctx, phono, wordpos, default, mask, y = build_arrays(samples)
    rng = np.random.default_rng(seed)
    params = model.init(jax.random.key(seed), ctx[:2], phono[:2],
                        wordpos[:2], default[:2], mask[:2])["params"]
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, c, ph, wp, d, m, t):
        def loss(p):
            lg = model.apply({"params": p}, c, ph, wp, d, m)
            return optax.softmax_cross_entropy_with_integer_labels(
                lg, t).mean()

        l, g = jax.value_and_grad(loss)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, l

    n = len(y)
    for _ in range(steps):
        idx = rng.integers(0, n, size=min(batch, n))
        params, opt, _ = step(params, opt, ctx[idx], phono[idx],
                              wordpos[idx], default[idx], mask[idx],
                              y[idx])
    return model, params


def predict_batch(model, params, samples) -> list[str]:
    """Batched prediction for (sentence, idx, char, _, span?) samples —
    one compiled dispatch for the whole set."""
    ctx, phono, wordpos, default, mask, _ = build_arrays(samples)
    logits = jax.jit(
        lambda p, c, ph, wp, d, m: model.apply({"params": p}, c, ph, wp,
                                               d, m))(
        params, jnp.asarray(ctx), jnp.asarray(phono),
        jnp.asarray(wordpos), jnp.asarray(default), jnp.asarray(mask))
    return [READINGS[int(k)] for k in np.asarray(jnp.argmax(logits, -1))]


def predict_reading(model, params, sentence: str, idx: int,
                    word_span: tuple[int, int] | None = None) -> str | None:
    """Predicted reading for the polychar at ``sentence[idx]``; None if
    the char is not in the inventory. ``word_span`` = the segmented
    word's (start, end) within ``sentence`` (position features)."""
    ch = sentence[idx]
    if ch not in INVENTORY:
        return None
    return predict_batch(model, params,
                         [(sentence, idx, ch, None, word_span)])[0]
