"""ONNX ingestion: native protobuf reader, DNSMOS CNN + protocol oracle,
UVR-MDX Conv-TDF converter, and the `convert_checkpoint` CLI entries.

The two reference components that ship ONNX (UVR-MDX separation,
`preprocessors/Emilia/models/separate_fast.py:60-70`; DNSMOS,
`.../models/dnsmos.py:46-51`) have native flax rebuilds; these tests pin

- the wire-format reader against hand-built fixtures (`write_onnx` is an
  independent encoder — encode and decode share no code),
- the weight mapping (graph order + layout transposes) by round-tripping
  flax-initialized params through an ONNX file,
- the DNSMOS clip protocol (segment walk, polyfit, means) against the
  reference `ComputeScore` with the SAME stub network on both sides.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amphion_tpu.utils.onnx_reader import (
    OnnxGraph,
    OnnxNode,
    read_onnx,
    write_onnx,
)

REFERENCE = Path("/root/reference")


# ---------------------------------------------------------------------------
# reader round-trips
# ---------------------------------------------------------------------------


def test_onnx_roundtrip_tensors(tmp_path):
    rng = np.random.default_rng(0)
    g = OnnxGraph(name="fixture")
    g.initializers["w_f32"] = rng.standard_normal((3, 4, 5)).astype(np.float32)
    g.initializers["w_f64"] = rng.standard_normal((2, 2)).astype(np.float64)
    g.initializers["w_i64"] = np.array([1, -2, 3], np.int64)
    g.initializers["w_i32"] = np.array([[4], [-5]], np.int32)
    g.initializers["w_f16"] = rng.standard_normal(7).astype(np.float16)
    g.initializers["scalar"] = np.float32(2.5).reshape(())
    g.nodes.append(OnnxNode(
        op_type="Conv", name="n0", inputs=["x", "w_f32"], outputs=["y"],
        attrs={"strides": [1, 1], "group": 1, "alpha": 0.5,
               "mode": b"constant"}))
    g.inputs, g.outputs = ["x"], ["y"]
    p = tmp_path / "m.onnx"
    write_onnx(p, g)
    back = read_onnx(p)
    assert back.name == "fixture"
    assert back.inputs == ["x"] and back.outputs == ["y"]
    for k, v in g.initializers.items():
        got = back.initializers[k]
        assert got.dtype == v.dtype and got.shape == v.shape, k
        np.testing.assert_array_equal(got, v)
    (n,) = back.nodes
    assert n.op_type == "Conv" and n.inputs == ["x", "w_f32"]
    assert n.attrs["strides"] == [1, 1] and n.attrs["group"] == 1
    assert abs(n.attrs["alpha"] - 0.5) < 1e-7 and n.attrs["mode"] == b"constant"


def test_onnx_reader_rejects_garbage(tmp_path):
    p = tmp_path / "x.onnx"
    p.write_bytes(b"\x00\x01\x02 not a protobuf at all")
    with pytest.raises(Exception):
        read_onnx(p)


# ---------------------------------------------------------------------------
# DNSMOS
# ---------------------------------------------------------------------------

from amphion_tpu.models.dnsmos import (  # noqa: E402
    DNSMOSConfig,
    DNSMOSNet,
    DNSMOSScorer,
    dnsmos_logmel,
    dnsmos_train_step,
    make_dnsmos_gate,
    onnx_to_dnsmos,
)

SMALL = DNSMOSConfig(n_mels=16, channels=(4, 4), dense=(8,))


def _dnsmos_fixture_graph(cfg: DNSMOSConfig, seed=0) -> tuple[OnnxGraph, dict]:
    """Hand-built ONNX graph whose Conv/Gemm initializers mirror a flax
    init of DNSMOSNet(cfg); returns (graph, expected flax params)."""
    model = DNSMOSNet(cfg)
    n_frames = 64
    ref = model.init(jax.random.key(seed),
                     jnp.zeros((1, n_frames, cfg.n_mels)))["params"]
    g = OnnxGraph(name="dnsmos_fixture")
    prev = "input_1"
    for i in range(len(cfg.channels)):
        k = np.asarray(ref[f"conv_{i}"]["kernel"])  # (kh, kw, I, O)
        g.initializers[f"cw{i}"] = np.transpose(k, (3, 2, 0, 1)).copy()
        g.initializers[f"cb{i}"] = np.asarray(ref[f"conv_{i}"]["bias"]).copy()
        g.nodes.append(OnnxNode("Conv", f"conv{i}",
                                [prev, f"cw{i}", f"cb{i}"], [f"c{i}"]))
        g.nodes.append(OnnxNode("Relu", f"relu{i}", [f"c{i}"], [f"r{i}"]))
        prev = f"r{i}"
    names = [f"dense_{i}" for i in range(len(cfg.dense))] + ["head"]
    for j, nm in enumerate(names):
        w = np.asarray(ref[nm]["kernel"])  # (I, O)
        g.initializers[f"dw{j}"] = w.T.copy()  # Gemm B with transB=1
        g.initializers[f"db{j}"] = np.asarray(ref[nm]["bias"]).copy()
        g.nodes.append(OnnxNode("Gemm", f"gemm{j}",
                                [prev, f"dw{j}", f"db{j}"], [f"g{j}"],
                                attrs={"transB": 1}))
        prev = f"g{j}"
    g.inputs, g.outputs = ["input_1"], [prev]
    return g, ref


def test_onnx_to_dnsmos_roundtrip(tmp_path):
    g, ref = _dnsmos_fixture_graph(SMALL)
    p = tmp_path / "dnsmos.onnx"
    write_onnx(p, g)
    params = onnx_to_dnsmos(read_onnx(p), SMALL)
    for path, v in jax.tree_util.tree_leaves_with_path(ref):
        t = params
        for part in [p.key for p in path]:
            t = t[part]
        np.testing.assert_array_equal(np.asarray(t), np.asarray(v),
                                      err_msg=str(path))
    # forward parity: converted params == original init params exactly
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 64, SMALL.n_mels)).astype(np.float32))
    model = DNSMOSNet(SMALL)
    np.testing.assert_array_equal(
        np.asarray(model.apply({"params": params}, x)),
        np.asarray(model.apply({"params": ref}, x)))


def test_onnx_to_dnsmos_shape_mismatch_raises(tmp_path):
    g, _ = _dnsmos_fixture_graph(SMALL)
    g.initializers["cw0"] = g.initializers["cw0"][:, :, :1, :1].copy()
    with pytest.raises(ValueError):
        onnx_to_dnsmos(g, SMALL)


def test_dnsmos_logmel_matches_librosa_semantics():
    """Shape + normalization contract: top value 1.0 == (0 dB + 40)/40,
    floor at -1.0 == (-80 dB + 40)/40."""
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    m = np.asarray(dnsmos_logmel(jnp.asarray(x)))
    cfg = DNSMOSConfig()
    n_fft = cfg.frame_size + 1
    want_frames = 1 + (16000 + 2 * (n_fft // 2) - n_fft) // cfg.hop
    assert m.shape == (2, want_frames, cfg.n_mels)
    assert np.isclose(m.max(), 1.0, atol=1e-5)
    assert m.min() >= (-80.0 + 40.0) / 40.0 - 1e-5


def _stub_net(seg_batch):
    """Deterministic raw [sig, bak, ovr] from a waveform segment batch —
    usable by BOTH the reference stub session and our scorer."""
    seg = np.asarray(seg_batch, np.float64)
    sig = 2.0 + seg.std(-1)
    bak = 3.0 - np.abs(seg).mean(-1)
    ovr = 2.5 + seg.mean(-1)
    return np.stack([sig, bak, ovr], -1).astype(np.float32)


@pytest.mark.skipif(not REFERENCE.exists(), reason="no reference tree")
def test_dnsmos_protocol_oracle():
    """Segment walk + polyfit + means == reference ComputeScore with the
    same stub network on both sides (ref dnsmos.py:106-180)."""
    import importlib.util
    import sys
    import types

    class _Sess:
        def __init__(self, *a, **k):
            pass

        def run(self, _out, feed):
            return [_stub_net(feed["input_1"])]

    ort_stub = types.ModuleType("onnxruntime")
    ort_stub.InferenceSession = _Sess
    librosa_stub = types.ModuleType("librosa")  # imported, unused @16k

    injected = []
    for name, mod in [("onnxruntime", ort_stub), ("librosa", librosa_stub)]:
        if name not in sys.modules:
            sys.modules[name] = mod
            injected.append(name)
    try:
        path = REFERENCE / "preprocessors" / "Emilia" / "models" / "dnsmos.py"
        spec = importlib.util.spec_from_file_location("_ref_dnsmos", path)
        ref_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_mod)
        ref_scorer = ref_mod.ComputeScore("stub")
    finally:
        for name in injected:
            sys.modules.pop(name, None)

    ours = DNSMOSScorer(
        params=None,
        forward_fn=lambda _p, segs: _stub_net(np.asarray(segs)))

    rng = np.random.default_rng(3)
    for dur_s, personalized in [(4.0, False), (11.5, False), (9.01, True)]:
        audio = (rng.standard_normal(int(16000 * dur_s)) * 0.1
                 ).astype(np.float32)
        want = ref_scorer(audio.copy(), 16000, personalized)
        got = ours(audio.copy(), 16000, personalized)
        assert got["num_hops"] == want["num_hops"]
        assert np.isclose(got["len_in_sec"], want["len_in_sec"])
        for k in ("OVRL_raw", "SIG_raw", "BAK_raw", "OVRL", "SIG", "BAK"):
            np.testing.assert_allclose(got[k], float(want[k]), rtol=0,
                                       atol=1e-5, err_msg=k)


def test_dnsmos_train_and_gate(tmp_path):
    """A few MSE steps reduce loss; make_dnsmos_gate(onnx) scores a clip."""
    import optax

    model = DNSMOSNet(SMALL)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, 64, SMALL.n_mels))
                    .astype(np.float32))
    y = jnp.asarray(rng.uniform(1, 5, (4, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), x)["params"]
    opt = optax.adam(5e-3)
    step = dnsmos_train_step(model, opt)
    state = opt.init(params)
    losses = []
    for i in range(60):
        params, state, loss = step(params, state, x, y, jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    g, _ = _dnsmos_fixture_graph(SMALL, seed=7)
    p = tmp_path / "d.onnx"
    write_onnx(p, g)
    gate = make_dnsmos_gate(cfg=SMALL, onnx_path=str(p))
    score = gate((rng.standard_normal(24000) * 0.1).astype(np.float32), 24000)
    assert np.isfinite(score)


# ---------------------------------------------------------------------------
# MDX Conv-TDF
# ---------------------------------------------------------------------------

from amphion_tpu.models.mdx_net import (  # noqa: E402
    ConvTDFNet,
    MDXConfig,
    _expected_param_walk,
    onnx_to_conv_tdf,
)

TINY = MDXConfig(n_fft=128, hop=32, dim_f=48, dim_t_log2=4,
                 num_blocks=5, conv_depth=1, growth=4, bottleneck=4)


def _mdx_fixture_graph(cfg: MDXConfig, seed=0):
    """ONNX graph in ConvTDFNet forward order from a flax init."""
    model = ConvTDFNet(cfg)
    probe = jnp.zeros((1, cfg.dim_t, cfg.dim_f, cfg.dim_c))
    variables = model.init(jax.random.key(seed), probe, train=True)
    params, stats = variables["params"], variables["batch_stats"]

    def sub(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    g = OnnxGraph(name="mdx_fixture")
    for idx, (path, kind) in enumerate(_expected_param_walk(cfg)):
        slot = sub(params, path)
        pre = f"t{idx}_"
        if kind == "conv":
            g.initializers[pre + "w"] = np.transpose(
                np.asarray(slot["kernel"]), (3, 2, 0, 1)).copy()
            g.initializers[pre + "b"] = np.asarray(slot["bias"]).copy()
            g.nodes.append(OnnxNode("Conv", pre, [f"x{idx}", pre + "w",
                                                  pre + "b"], [f"x{idx+1}"]))
        elif kind == "deconv":
            g.initializers[pre + "w"] = np.transpose(
                np.asarray(slot["kernel"]), (2, 3, 0, 1)).copy()
            g.initializers[pre + "b"] = np.asarray(slot["bias"]).copy()
            g.nodes.append(OnnxNode("ConvTranspose", pre,
                                    [f"x{idx}", pre + "w", pre + "b"],
                                    [f"x{idx+1}"]))
        elif kind == "dense":
            g.initializers[pre + "w"] = np.asarray(slot["kernel"]).copy()
            g.initializers[pre + "b"] = np.asarray(slot["bias"]).copy()
            g.nodes.append(OnnxNode("MatMul", pre,
                                    [f"x{idx}", pre + "w", pre + "b"],
                                    [f"x{idx+1}"]))
        else:  # norm
            g.initializers[pre + "s"] = np.asarray(slot["scale"]).copy()
            g.initializers[pre + "b"] = np.asarray(slot["bias"]).copy()
            ins = [f"x{idx}", pre + "s", pre + "b"]
            try:
                st = sub(stats, path)
                g.initializers[pre + "m"] = np.asarray(st["mean"]).copy()
                g.initializers[pre + "v"] = np.asarray(st["var"]).copy()
                ins += [pre + "m", pre + "v"]
                op = "BatchNormalization"
            except (KeyError, TypeError):
                op = "GroupNormalization"
            g.nodes.append(OnnxNode(op, pre, ins, [f"x{idx+1}"]))
    g.inputs, g.outputs = ["x0"], [f"x{len(g.nodes)}"]
    return g, variables


def test_onnx_to_conv_tdf_roundtrip(tmp_path):
    g, variables = _mdx_fixture_graph(TINY)
    p = tmp_path / "mdx.onnx"
    write_onnx(p, g)
    got = onnx_to_conv_tdf(read_onnx(p), TINY)

    def assert_tree(a, b, where):
        if isinstance(a, dict):
            assert set(a) == set(b), where
            for k in a:
                assert_tree(a[k], b[k], f"{where}/{k}")
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=where)

    assert_tree(jax.device_get(variables["params"]),
                jax.device_get(got["params"]), "params")
    assert_tree(jax.device_get(variables["batch_stats"]),
                jax.device_get(got["batch_stats"]), "batch_stats")

    model = ConvTDFNet(TINY)
    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, TINY.dim_t, TINY.dim_f, 4)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(model.apply(variables, x)),
        np.asarray(model.apply(got, x)))


def test_onnx_to_conv_tdf_wrong_topology_raises():
    g, _ = _mdx_fixture_graph(TINY)
    g.nodes = g.nodes[:-1]  # drop final conv
    with pytest.raises(ValueError):
        onnx_to_conv_tdf(g, TINY)


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def test_convert_checkpoint_cli_onnx(tmp_path):
    """--model dnsmos / mdx_net: onnx file → loadable orbax checkpoint."""
    from bins.convert_checkpoint import convert_one

    from amphion_tpu.runtime.checkpoint import CheckpointManager

    g, ref = _dnsmos_fixture_graph(SMALL, seed=9)
    p = tmp_path / "dnsmos.onnx"
    write_onnx(p, g)
    out = tmp_path / "ck_dnsmos"
    convert_one("dnsmos", p, out,
                kw={"n_mels": SMALL.n_mels, "channels": SMALL.channels,
                    "dense": SMALL.dense})
    tree, _, _ = CheckpointManager(out).restore_raw()
    np.testing.assert_array_equal(
        np.asarray(tree["params"]["conv_0"]["kernel"]),
        np.asarray(ref["conv_0"]["kernel"]))

    gm, variables = _mdx_fixture_graph(TINY, seed=9)
    pm = tmp_path / "mdx.onnx"
    write_onnx(pm, gm)
    outm = tmp_path / "ck_mdx"
    convert_one("mdx_net", pm, outm,
                kw={"n_fft": TINY.n_fft, "hop": TINY.hop,
                    "dim_f": TINY.dim_f, "dim_t_log2": TINY.dim_t_log2,
                    "num_blocks": TINY.num_blocks,
                    "conv_depth": TINY.conv_depth, "growth": TINY.growth,
                    "bottleneck": TINY.bottleneck})
    treem, _, _ = CheckpointManager(outm).restore_raw()
    np.testing.assert_array_equal(
        np.asarray(treem["params"]["first_conv"]["kernel"]),
        np.asarray(variables["params"]["first_conv"]["kernel"]))
    assert "batch_stats" in treem
