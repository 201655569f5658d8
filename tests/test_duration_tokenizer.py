import numpy as np
import pytest

from amphion_tpu.data.metadata import Utterance
from amphion_tpu.data.processors.duration import (
    parse_textgrid,
    prepare_mfa_corpus,
    textgrid_to_durations,
)

TEXTGRID = '''File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 1.0
        intervals: size = 1
        intervals [1]:
            xmin = 0
            xmax = 1.0
            text = "hi"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 3
        intervals [1]:
            xmin = 0
            xmax = 0.25
            text = "HH"
        intervals [2]:
            xmin = 0.25
            xmax = 0.75
            text = "AY1"
        intervals [3]:
            xmin = 0.75
            xmax = 1.0
            text = ""
'''


def test_parse_textgrid(tmp_path):
    p = tmp_path / "a.TextGrid"
    p.write_text(TEXTGRID)
    ints = parse_textgrid(p, "phones")
    assert len(ints) == 3
    assert ints[1] == (0.25, 0.75, "AY1")


def test_textgrid_to_durations(tmp_path):
    p = tmp_path / "a.TextGrid"
    p.write_text(TEXTGRID)
    phones, durs = textgrid_to_durations(p, hop_size=80, sample_rate=8000)
    assert phones == ["HH", "AY1", "sil"]
    assert durs.sum() == 100  # 1 s at 100 fps
    np.testing.assert_array_equal(durs, [25, 50, 25])


def test_prepare_mfa_corpus(tmp_path, rng):
    from amphion_tpu.data.audio_io import save_wav

    wav = tmp_path / "u1.wav"
    save_wav(wav, rng.standard_normal(800).astype(np.float32) * 0.1, 8000)
    utts = [Utterance("d", "u1", str(wav), 0.1, speaker="s1", text="hello")]
    out = prepare_mfa_corpus(utts, tmp_path / "mfa")
    assert (out / "s1" / "u1.wav").is_file()
    assert (out / "s1" / "u1.lab").read_text().strip() == "hello"


def test_audio_tokenizer_facade(rng):
    import jax

    from amphion_tpu.models.codec.amphion_codec import AmphionCodec, CodecConfig
    from amphion_tpu.utils.tokenizer import AudioTokenizer

    cfg = CodecConfig(sample_rate=8000, encoder_dim=4, latent_dim=8,
                      decoder_dim=4, strides=(2, 4), num_quantizers=2,
                      codebook_size=16, codebook_dim=4)
    codec = AmphionCodec(cfg)
    audio = (rng.standard_normal(8 * cfg.hop) * 0.2).astype(np.float32)
    params = codec.init(jax.random.key(0), audio[None])["params"]
    tok = AudioTokenizer(codec, params, 8000)
    codes = tok.encode(audio)
    assert codes.shape == (1, 2, 8)
    wav = tok.decode(codes)
    assert wav.shape == (1, len(audio))
