"""Tiny native polyphone-disambiguation model (the role the reference
fills with an ONNX BERT over 159 polychars / 391 readings,
`models/tts/maskgct/g2p/g2p/chinese_model_g2p.py` + the
`g2p_chinese_model/{polychar.txt,polydict.json}` class map).

A char-window context classifier: hashed char embeddings over a ±W
window around the target polychar, position-tagged, mean+concat pooled
into an MLP over the global reading vocabulary; predictions are masked
to the target char's candidate readings from
`polyphone_inventory.INVENTORY`. It backs up the rule+lexicon layer for
out-of-lexicon contexts; training data is generated from the realization
lexicons (`polyphone_dataset`), so the model generalizes the curated
knowledge rather than memorizing the rule author's test cases — the test
holds out whole words (tests/test_polyphone_inventory.py)."""

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


def char_bucket(ch: str) -> int:
    """Stable hash bucket for a character (0 reserved for padding)."""
    h = int.from_bytes(hashlib.sha1(ch.encode()).digest()[:4], "little")
    return 1 + h % (N_BUCKETS - 1)


def encode_context(text: str, idx: int) -> np.ndarray:
    """(2*WINDOW+1,) int32 bucket ids: [left.., target, ..right], zero
    padded at sentence edges."""
    out = np.zeros(2 * WINDOW + 1, np.int32)
    for k in range(-WINDOW, WINDOW + 1):
        j = idx + k
        if 0 <= j < len(text):
            out[k + WINDOW] = char_bucket(text[j])
    return out


class PolyphoneClassifier(nn.Module):
    embed_dim: int = 48
    hidden: int = 256

    @nn.compact
    def __call__(self, ctx_ids, cand_mask):
        """ctx_ids (B, 2W+1) int32; cand_mask (B, R) → logits (B, R)."""
        emb = nn.Embed(N_BUCKETS, self.embed_dim, name="chars")(ctx_ids)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (2 * WINDOW + 1, self.embed_dim))
        emb = emb + pos[None]
        flat = emb.reshape(emb.shape[0], -1)
        h = nn.relu(nn.Dense(self.hidden, name="fc1")(flat))
        logits = nn.Dense(len(READINGS), name="out")(h)
        return jnp.where(cand_mask > 0, logits, -1e9)


def polyphone_dataset(word_lexicons: list[dict[str, str]],
                      templates: tuple[str, ...] = (
                          "我们{W}以后", "这个{W}真的", "他说{W}了吗",
                          "关于{W}的事", "{W}", "就是{W}而已",
                          "昨天{W}今天", "因为{W}所以"),
                      ) -> list[tuple[str, int, str, str]]:
    """(sentence, polychar index, char, reading) samples from every
    lexicon word containing an inventory char, embedded in neutral
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
                        idx = sent.index(word) + ci
                        samples.append((sent, idx, ch, r))
    return samples


def build_arrays(samples):
    ctx = np.stack([encode_context(s, i) for s, i, _, _ in samples])
    mask = np.stack([_CHAR_MASK[c] for _, _, c, _ in samples])
    y = np.array([READING_ID[r] for _, _, _, r in samples], np.int32)
    return ctx, mask, y


def train_classifier(samples, steps: int = 300, lr: float = 3e-3,
                     batch: int = 256, seed: int = 0):
    """Fit on generated samples; returns (module, params)."""
    import optax

    model = PolyphoneClassifier()
    ctx, mask, y = build_arrays(samples)
    rng = np.random.default_rng(seed)
    params = model.init(jax.random.key(seed), ctx[:2], mask[:2])["params"]
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, c, m, t):
        def loss(p):
            lg = model.apply({"params": p}, c, m)
            return optax.softmax_cross_entropy_with_integer_labels(
                lg, t).mean()

        l, g = jax.value_and_grad(loss)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, l

    n = len(y)
    for _ in range(steps):
        idx = rng.integers(0, n, size=min(batch, n))
        params, opt, _ = step(params, opt, ctx[idx], mask[idx], y[idx])
    return model, params


def predict_batch(model, params, samples) -> list[str]:
    """Batched prediction for (sentence, idx, char, _) samples — one
    compiled dispatch for the whole set."""
    ctx = np.stack([encode_context(s, i) for s, i, _, _ in samples])
    mask = np.stack([_CHAR_MASK[c] for _, _, c, _ in samples])
    logits = jax.jit(lambda p, c, m: model.apply({"params": p}, c, m))(
        params, jnp.asarray(ctx), jnp.asarray(mask))
    return [READINGS[int(k)] for k in np.asarray(jnp.argmax(logits, -1))]


def predict_reading(model, params, sentence: str, idx: int) -> str | None:
    """Predicted reading for the polychar at ``sentence[idx]``; None if
    the char is not in the inventory."""
    ch = sentence[idx]
    if ch not in INVENTORY:
        return None
    return predict_batch(model, params, [(sentence, idx, ch, None)])[0]
