"""SSL content-feature extraction (reference: `processors/content_extractor.py`
— WhisperExtractor:267, ContentvecExtractor:317, WenetExtractor:357,
MertExtractor:446, HubertExtractor:502, with frame-rate re-alignment
`offline_resolution_transformation:101`).

Each extractor wraps a frozen `transformers` checkpoint on the host (the
reference does the same with torch/fairseq checkpoints):
- whisper   → WhisperModel encoder states (50 Hz)
- contentvec/hubert → HubertModel hidden states (50 Hz)
- mert      → music SSL features (Wav2Vec2-family interface)
- wenet     → conformer ASR features; approximated by a Wav2Vec2Conformer
  checkpoint (the reference vendors an 11.7k-LoC WeNet stack solely to get
  frozen conformer features)
- w2v-bert  → Wav2Vec2BertModel (MaskGCT semantic features)

`align_content_features` resamples the feature rate to the mel frame rate
(ref `offline_resolution_transformation`).
"""

from __future__ import annotations

import numpy as np

_MODEL_CACHE: dict = {}


def _to_16k(audio: np.ndarray, sample_rate: int) -> np.ndarray:
    if sample_rate == 16000:
        return np.asarray(audio, np.float32)
    from amphion_tpu.data.audio_io import resample

    return resample(np.asarray(audio, np.float32), sample_rate, 16000)


def _cached(key, builder):
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = builder()
    return _MODEL_CACHE[key]


def whisper_extractor(model_name: str = "openai/whisper-base"):
    def build():
        import torch
        from transformers import WhisperModel, WhisperProcessor

        proc = WhisperProcessor.from_pretrained(model_name)
        model = WhisperModel.from_pretrained(model_name).eval()

        def extract(audio, sample_rate=16000) -> np.ndarray:
            x = _to_16k(audio, sample_rate)
            inputs = proc(x, sampling_rate=16000, return_tensors="pt")
            with torch.no_grad():
                enc = model.encoder(inputs.input_features).last_hidden_state
            n_frames = int(len(x) / 16000 * 50)
            return enc[0, :n_frames].numpy()

        return extract

    return _cached(("whisper", model_name), build)


def hubert_extractor(model_name: str = "facebook/hubert-base-ls960",
                     layer: int = -1):
    def build():
        import torch
        from transformers import AutoFeatureExtractor, HubertModel

        fe = AutoFeatureExtractor.from_pretrained(model_name)
        model = HubertModel.from_pretrained(model_name).eval()

        def extract(audio, sample_rate=16000) -> np.ndarray:
            x = _to_16k(audio, sample_rate)
            inputs = fe(x, sampling_rate=16000, return_tensors="pt")
            with torch.no_grad():
                out = model(inputs.input_values, output_hidden_states=True)
            return out.hidden_states[layer][0].numpy()

        return extract

    return _cached(("hubert", model_name, layer), build)


def contentvec_extractor(model_name: str = "facebook/hubert-base-ls960"):
    """ContentVec = speaker-disentangled HuBERT; same interface/rate. The
    reference loads a fairseq ContentVec ckpt — any HuBERT-family checkpoint
    converted to transformers plugs in here."""
    return hubert_extractor(model_name, layer=-1)


def mert_extractor(model_name: str = "m-a-p/MERT-v1-95M"):
    def build():
        import torch
        from transformers import AutoModel, Wav2Vec2FeatureExtractor

        fe = Wav2Vec2FeatureExtractor.from_pretrained(model_name)
        model = AutoModel.from_pretrained(model_name, trust_remote_code=True).eval()

        def extract(audio, sample_rate=16000) -> np.ndarray:
            sr = fe.sampling_rate
            if sample_rate != sr:
                from amphion_tpu.data.audio_io import resample

                audio = resample(np.asarray(audio, np.float32), sample_rate, sr)
            inputs = fe(audio, sampling_rate=sr, return_tensors="pt")
            with torch.no_grad():
                return model(**inputs).last_hidden_state[0].numpy()

        return extract

    return _cached(("mert", model_name), build)


def wenet_extractor(model_name: str = "facebook/wav2vec2-conformer-rope-large-960h-ft"):
    def build():
        import torch
        from transformers import AutoFeatureExtractor, Wav2Vec2ConformerModel

        fe = AutoFeatureExtractor.from_pretrained(model_name)
        model = Wav2Vec2ConformerModel.from_pretrained(model_name).eval()

        def extract(audio, sample_rate=16000) -> np.ndarray:
            x = _to_16k(audio, sample_rate)
            inputs = fe(x, sampling_rate=16000, return_tensors="pt")
            with torch.no_grad():
                return model(inputs.input_values).last_hidden_state[0].numpy()

        return extract

    return _cached(("wenet", model_name), build)


def w2v_bert_extractor(model_name: str = "facebook/w2v-bert-2.0",
                       layer: int = 17):
    """MaskGCT semantic features (ref `maskgct_utils.py:46` uses w2v-bert-2.0
    hidden layer 17)."""

    def build():
        import torch
        from transformers import AutoFeatureExtractor, Wav2Vec2BertModel

        fe = AutoFeatureExtractor.from_pretrained(model_name)
        model = Wav2Vec2BertModel.from_pretrained(model_name).eval()

        def extract(audio, sample_rate=16000) -> np.ndarray:
            x = _to_16k(audio, sample_rate)
            inputs = fe(x, sampling_rate=16000, return_tensors="pt")
            with torch.no_grad():
                out = model(**inputs, output_hidden_states=True)
            return out.hidden_states[layer][0].numpy()

        return extract

    return _cached(("w2v_bert", model_name, layer), build)


def wenet_native_extractor(ckpt_path: str, num_layers: int = 12,
                           hidden: int = 256, num_heads: int = 4,
                           ffn_hidden: int = 2048):
    """TPU-native WeNet replacement: our flax ConformerEncoder
    (`modules/conformer.py`) with weights converted from a WeNet torch
    checkpoint (`utils/convert.wenet_conformer_to_flax`), fed by the
    on-device fbank front end (80-dim HTK log-mel @16k, 25ms/10ms) — the
    extractor itself runs jitted on the accelerator instead of torch-CPU."""

    def build():
        import jax
        import jax.numpy as jnp

        from amphion_tpu.modules.conformer import (
            ConformerConfig,
            ConformerEncoder,
        )
        from amphion_tpu.ops.mel import MelConfig, mel_spectrogram
        from amphion_tpu.utils.convert import (
            load_torch_checkpoint,
            wenet_conformer_to_flax,
        )

        sd = load_torch_checkpoint(ckpt_path)
        params = jax.tree_util.tree_map(
            jnp.asarray, wenet_conformer_to_flax(sd, num_layers, hidden)
        )
        model = ConformerEncoder(ConformerConfig(
            input_dim=80, hidden=hidden, num_layers=num_layers,
            num_heads=num_heads, ffn_hidden=ffn_hidden,
        ))
        fbank_cfg = MelConfig(sample_rate=16000, n_fft=512, win_size=400,
                              hop_size=160, n_mel=80, fmin=0.0, fmax=8000.0,
                              htk=True)
        fwd = jax.jit(lambda prm, fb: model.apply({"params": prm}, fb)[0])

        def extract(audio, sample_rate=16000) -> np.ndarray:
            x = _to_16k(audio, sample_rate)
            t = max(len(x) // 160 * 160, 160)
            fb = mel_spectrogram(jnp.asarray(x[:t])[None], fbank_cfg)
            return np.asarray(fwd(params, fb.transpose(0, 2, 1)))[0]

        return extract

    return _cached(("wenet_native", ckpt_path, num_layers, hidden,
                    num_heads, ffn_hidden), build)


def _load_hf_dir(model_dir):
    """(config dict, numpy state dict) from a local HF checkpoint directory
    (config.json + model.safetensors | pytorch_model.bin)."""
    import json
    from pathlib import Path

    d = Path(model_dir)
    cfg = json.loads((d / "config.json").read_text())
    from amphion_tpu.utils.convert import (
        load_safetensors,
        load_torch_checkpoint,
    )

    if (d / "model.safetensors").exists():
        sd = load_safetensors(d / "model.safetensors")
    else:
        sd = load_torch_checkpoint(d / "pytorch_model.bin")
    return cfg, sd


def hubert_native_extractor(model_dir: str, layer: int = -1):
    """TPU-native HuBERT/ContentVec/MERT extractor: our flax
    `HubertEncoder` jitted on device, weights converted from a local HF
    checkpoint dir. Inputs are padded to 1 s buckets with a frame mask so
    XLA compiles one program per bucket, not per utterance length."""

    def build():
        import jax
        import jax.numpy as jnp

        from amphion_tpu.models.ssl_encoders import HubertConfig, HubertEncoder
        from amphion_tpu.utils.convert import hf_hubert_to_flax

        hf, sd = _load_hf_dir(model_dir)
        cfg = HubertConfig(
            hidden=hf["hidden_size"], num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            ffn_hidden=hf["intermediate_size"],
            conv_dim=tuple(hf["conv_dim"]),
            conv_kernel=tuple(hf["conv_kernel"]),
            conv_stride=tuple(hf["conv_stride"]),
            conv_bias=hf.get("conv_bias", False),
            feat_extract_norm=hf["feat_extract_norm"],
            do_stable_layer_norm=hf.get("do_stable_layer_norm", False),
            num_conv_pos_embeddings=hf.get("num_conv_pos_embeddings", 128),
            num_conv_pos_embedding_groups=hf.get(
                "num_conv_pos_embedding_groups", 16))
        params = jax.tree_util.tree_map(jnp.asarray, hf_hubert_to_flax(
            sd, num_layers=cfg.num_layers,
            num_feat_layers=len(cfg.conv_dim),
            feat_extract_norm=cfg.feat_extract_norm))
        return _hubert_extract_fns(cfg, params, layer)

    return _cached(("hubert_native", model_dir, layer), build)


def _hubert_extract_fns(cfg, params, layer):
    """Jitted bucket-padded extract()/extract.batch() over a
    `HubertEncoder` (shared by the HF-dir and fairseq-ckpt loaders)."""
    import jax
    import jax.numpy as jnp

    from amphion_tpu.models.ssl_encoders import HubertEncoder

    model = HubertEncoder(cfg)

    @jax.jit
    def fwd(wav, num_valid):
        # frozen extractor: feature fidelity over MXU throughput (TPU
        # default bf16 matmuls cost ~3e-2 abs error on these features)
        with jax.default_matmul_precision("float32"):
            _, hidden = model.apply({"params": params}, wav,
                                    num_valid=num_valid)
        return hidden[layer]

    def extract(audio, sample_rate=16000) -> np.ndarray:
        return extract_batch([audio], sample_rate)[0]

    def extract_batch(audios, sample_rate=16000) -> list:
        xs = [_to_16k(a, sample_rate) for a in audios]
        t_pad = max(max(-(-len(x) // 16000) * 16000 for x in xs), 16000)
        wav = np.zeros((len(xs), t_pad), np.float32)
        for i, x in enumerate(xs):
            wav[i, :len(x)] = x
        out = np.asarray(fwd(jnp.asarray(wav),
                             jnp.asarray([len(x) for x in xs])))
        return [out[i, :cfg.frame_length(len(x))]
                for i, x in enumerate(xs)]

    extract.batch = extract_batch
    return extract


def contentvec_fairseq_extractor(ckpt_path: str, layer: int = -1,
                                 num_layers: int = 12, hidden: int = 768,
                                 num_heads: int = 12, ffn_hidden: int = 3072,
                                 feat_extract_norm: str = "group",
                                 **cfg_overrides):
    """TPU-native ContentVec/fairseq-HuBERT extractor: loads the fairseq
    checkpoint layout the reference uses directly
    (`checkpoint_best_legacy_500.pt`, `content_extractor.py:317`) into our
    flax `HubertEncoder` (defaults = HuBERT-base geometry)."""

    def build():
        import jax
        import jax.numpy as jnp

        from amphion_tpu.models.ssl_encoders import HubertConfig
        from amphion_tpu.utils.convert import (
            fairseq_hubert_to_flax,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(ckpt_path)
        cfg = HubertConfig(
            hidden=hidden, num_layers=num_layers, num_heads=num_heads,
            ffn_hidden=ffn_hidden, feat_extract_norm=feat_extract_norm,
            do_stable_layer_norm=False, **cfg_overrides)
        params = jax.tree_util.tree_map(jnp.asarray, fairseq_hubert_to_flax(
            sd, num_layers=num_layers, num_feat_layers=len(cfg.conv_dim),
            feat_extract_norm=feat_extract_norm))
        return _hubert_extract_fns(cfg, params, layer)

    return _cached(("contentvec_fairseq", ckpt_path, layer, num_layers,
                    hidden, tuple(sorted(cfg_overrides.items()))), build)


def w2v_bert_native_extractor(model_dir: str, layer: int = 17):
    """TPU-native w2v-bert-2.0 extractor (MaskGCT semantic features,
    ref `maskgct_utils.py:46-56` taps hidden layer 17). Fully on-device:
    the Kaldi-style fbank front end (`ops/ssl_frontend.seamless_fbank`)
    and the conformer run in ONE jitted program over 1 s wav buckets."""

    def build():
        import jax
        import jax.numpy as jnp

        from amphion_tpu.models.ssl_encoders import (
            W2VBertConfig,
            W2VBertEncoder,
        )
        from amphion_tpu.ops.ssl_frontend import (
            num_fbank_frames,
            seamless_fbank,
        )
        from amphion_tpu.utils.convert import hf_w2v_bert_to_flax

        hf, sd = _load_hf_dir(model_dir)
        cfg = W2VBertConfig(
            hidden=hf["hidden_size"], num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            ffn_hidden=hf["intermediate_size"],
            input_dim=hf.get("feature_projection_input_dim", 160),
            conv_kernel=hf.get("conv_depthwise_kernel_size", 31),
            left_max_pos=hf.get("left_max_position_embeddings", 64),
            right_max_pos=hf.get("right_max_position_embeddings", 8))
        params = jax.tree_util.tree_map(
            jnp.asarray, hf_w2v_bert_to_flax(sd, num_layers=cfg.num_layers))
        model = W2VBertEncoder(cfg)
        n_mels = cfg.input_dim // 2

        @jax.jit
        def fwd(wav, num_valid):
            with jax.default_matmul_precision("float32"):
                feats = seamless_fbank(wav, n_mels=n_mels,
                                       num_valid_samples=num_valid)
                # stacked-frame validity: ceil(valid_frames / 2)
                nv = (num_fbank_frames(num_valid) + 1) // 2
                mask = (jnp.arange(feats.shape[1])[None, :]
                        < nv[:, None]).astype(feats.dtype)
                _, hidden = model.apply({"params": params}, feats, mask)
            return hidden[layer]

        def extract(audio, sample_rate=16000) -> np.ndarray:
            return extract_batch([audio], sample_rate)[0]

        def extract_batch(audios, sample_rate=16000) -> list:
            xs = [_to_16k(a, sample_rate) for a in audios]
            t_pad = max(max(-(-len(x) // 16000) * 16000 for x in xs), 16000)
            wav = np.zeros((len(xs), t_pad), np.float32)
            for i, x in enumerate(xs):
                wav[i, :len(x)] = x
            out = np.asarray(fwd(jnp.asarray(wav),
                                 jnp.asarray([len(x) for x in xs])))
            return [out[i, :(num_fbank_frames(len(x)) + 1) // 2]
                    for i, x in enumerate(xs)]

        extract.batch = extract_batch
        return extract

    return _cached(("w2v_bert_native", model_dir, layer), build)


def whisper_native_extractor(model_dir: str):
    """TPU-native Whisper-encoder extractor, fully on-device: the log-mel
    front end (`ops/ssl_frontend.whisper_log_mel` over the fixed 30 s
    window — same contract as the reference's `WhisperExtractor:267`) and
    the encoder run in ONE jitted program."""

    def build():
        import jax
        import jax.numpy as jnp

        from amphion_tpu.models.ssl_encoders import (
            WhisperEncConfig,
            WhisperEncoder,
        )
        from amphion_tpu.ops.ssl_frontend import whisper_log_mel
        from amphion_tpu.utils.convert import hf_whisper_encoder_to_flax

        hf, sd = _load_hf_dir(model_dir)
        cfg = WhisperEncConfig(
            hidden=hf["d_model"], num_layers=hf["encoder_layers"],
            num_heads=hf["encoder_attention_heads"],
            ffn_hidden=hf["encoder_ffn_dim"],
            n_mels=hf.get("num_mel_bins", 80),
            max_source_positions=hf.get("max_source_positions", 1500))
        params = jax.tree_util.tree_map(jnp.asarray, hf_whisper_encoder_to_flax(
            sd, num_layers=cfg.num_layers))
        model = WhisperEncoder(cfg)

        @jax.jit
        def fwd(wav):
            with jax.default_matmul_precision("float32"):
                mel = whisper_log_mel(wav, n_mels=cfg.n_mels)
                return model.apply({"params": params},
                                   mel.transpose(0, 2, 1))

        n_samples = cfg.max_source_positions * 2 * 160  # 30 s default

        def extract(audio, sample_rate=16000) -> np.ndarray:
            return extract_batch([audio], sample_rate)[0]

        def extract_batch(audios, sample_rate=16000) -> list:
            xs = [_to_16k(a, sample_rate) for a in audios]
            buf = np.zeros((len(xs), n_samples), np.float32)
            for i, x in enumerate(xs):
                buf[i, :min(len(x), n_samples)] = x[:n_samples]
            out = np.asarray(fwd(jnp.asarray(buf)))
            return [out[i, :int(len(x) / 16000 * 50)]
                    for i, x in enumerate(xs)]

        extract.batch = extract_batch
        return extract

    return _cached(("whisper_native", model_dir), build)


EXTRACTORS = {
    "whisper": whisper_extractor,
    "hubert": hubert_extractor,
    "contentvec": contentvec_extractor,
    "mert": mert_extractor,
    "wenet": wenet_extractor,
    "wenet_native": wenet_native_extractor,
    "w2v_bert": w2v_bert_extractor,
    "hubert_native": hubert_native_extractor,
    "contentvec_native": hubert_native_extractor,
    "contentvec_fairseq": contentvec_fairseq_extractor,
    "mert_native": hubert_native_extractor,
    "w2v_bert_native": w2v_bert_native_extractor,
    "whisper_native": whisper_native_extractor,
}


def align_content_features(feats: np.ndarray, target_frames: int) -> np.ndarray:
    """Resample (T_src, D) features to target_frames by linear interpolation
    (ref `offline_resolution_transformation:101`), vectorized over the
    feature dim (real SSL features are D=768-1280; a per-dim np.interp
    loop dominates extraction time)."""
    src = feats.shape[0]
    if src == target_frames:
        return feats
    if src == 1:
        return np.repeat(feats, target_frames, axis=0)
    # positions of target frames in source index coordinates
    pos = np.linspace(0.0, src - 1.0, target_frames)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, src - 2)
    w = (pos - lo)[:, None].astype(feats.dtype)
    out = feats[lo] * (1.0 - w) + feats[lo + 1] * w
    return out.astype(feats.dtype)


def extract_content_features(
    extractor_name: str,
    utterances,
    output_dir,
    sample_rate: int,
    target_hop: int | None = None,
    batch_size: int = 8,
    **extractor_kw,
):
    """Offline extraction loop → per-uid .npy (ref
    `content_extractor.py:561`)."""
    from pathlib import Path

    from amphion_tpu.data.audio_io import load_wav

    out = Path(output_dir) / extractor_name
    out.mkdir(parents=True, exist_ok=True)
    extract = EXTRACTORS[extractor_name](**extractor_kw)
    batch_fn = getattr(extract, "batch", None)
    utterances = list(utterances)

    def _save(u, x, feats):
        if target_hop is not None:
            feats = align_content_features(feats, len(x) // target_hop)
        np.save(out / f"{u.uid}.npy", feats)

    if batch_fn is None:
        for u in utterances:
            x, sr = load_wav(u.path, sr=sample_rate)
            _save(u, x, extract(x, sample_rate))
        return out
    # device extractors: bucket by duration and run batched (one program
    # per 1 s bucket; ~50 ms tunnel dispatch + MXU batch efficiency)
    loaded = []
    for u in utterances:
        x, sr = load_wav(u.path, sr=sample_rate)
        loaded.append((u, x))
    loaded.sort(key=lambda t: len(t[1]))
    for i in range(0, len(loaded), batch_size):
        chunk = loaded[i:i + batch_size]
        feats = batch_fn([x for _, x in chunk], sample_rate)
        for (u, x), f in zip(chunk, feats):
            _save(u, x, f)
    return out


def compute_feature_stats(feature_files, out_path=None):
    """Per-dim mean/std over a set of extracted feature .npy files (the
    reference's offline whisper stats — `rep_coco_trainer.py:115` loads
    ``whisper_stats_path`` with ``{"mean": (D,), "std": (D,)}`` and
    standardizes features before tokenization). Streaming Welford over
    frames; returns (mean, std) float32 and writes ``out_path`` .npz when
    given."""
    count = 0
    mean = m2 = None
    for f in feature_files:
        x = np.load(f).astype(np.float64)
        x = x.reshape(-1, x.shape[-1])
        if mean is None:
            mean = np.zeros(x.shape[-1])
            m2 = np.zeros(x.shape[-1])
        for row_chunk in np.array_split(x, max(1, len(x) // 4096)):
            n = len(row_chunk)
            if n == 0:
                continue
            cm = row_chunk.mean(axis=0)
            cv = row_chunk.var(axis=0)
            delta = cm - mean
            tot = count + n
            mean = mean + delta * n / tot
            m2 = m2 + cv * n + delta**2 * count * n / tot
            count = tot
    std = np.sqrt(np.maximum(m2 / max(count, 1), 1e-12))
    mean, std = mean.astype(np.float32), std.astype(np.float32)
    if out_path is not None:
        np.savez(out_path, mean=mean, std=std)
    return mean, std
