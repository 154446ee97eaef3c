"""Caffemodel converter tests: a synthetic NetParameter protobuf is
encoded at the wire level in the test (independent of the parser code),
parsed back, and mapped onto the Flax SegNet tree."""

import struct

import jax
import numpy as np
import pytest

from sivo_tpu.models import caffe_io, segnet


# -- independent wire-format ENCODER (test-side oracle) ---------------------

def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field: int, wtype: int) -> bytes:
    return _varint((field << 3) | wtype)


def _ld(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def encode_blob(arr: np.ndarray) -> bytes:
    shape_msg = b"".join(_tag(1, 0) + _varint(d) for d in arr.shape)
    data = arr.astype("<f4").tobytes()
    return _ld(7, shape_msg) + _ld(5, data)


def encode_layer(name: str, type_: str, blobs: list[np.ndarray]) -> bytes:
    msg = _ld(1, name.encode()) + _ld(2, type_.encode())
    for b in blobs:
        msg += _ld(7, encode_blob(b))
    return msg


def encode_net(layers: list[tuple[str, str, list[np.ndarray]]]) -> bytes:
    out = _ld(1, b"testnet")
    for name, type_, blobs in layers:
        out += _ld(100, encode_layer(name, type_, blobs))
    return out


def test_parse_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 3, 7, 7)).astype(np.float32)
    b = rng.normal(size=(64,)).astype(np.float32)
    raw = encode_net([("conv1", "Convolution", [w, b])])
    layers = caffe_io.parse_caffemodel(raw)
    assert "conv1" in layers
    np.testing.assert_array_equal(layers["conv1"][0], w)
    np.testing.assert_array_equal(layers["conv1"][1], b)


def test_lfs_stub_detected():
    with pytest.raises(ValueError, match="Git-LFS"):
        caffe_io.parse_caffemodel(
            b"version https://git-lfs.github.com/spec/v1\noid sha256:ab\n"
        )
    # the reference's actual stub files trigger the same error
    with open(
        "/root/reference/tests/config/test_weights.caffemodel", "rb"
    ) as f:
        with pytest.raises(ValueError, match="Git-LFS"):
            caffe_io.parse_caffemodel(f.read())


def test_conv_transpose_matches_flax_layout():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(8, 3, 7, 7)).astype(np.float32)
    out = caffe_io.conv_to_flax(w, None)
    assert out["kernel"].shape == (7, 7, 3, 8)
    # spot-check one element: caffe [o, i, kh, kw] -> flax [kh, kw, i, o]
    assert out["kernel"][2, 4, 1, 5] == w[5, 1, 2, 4]


def test_full_basic_model_loads(tmp_path):
    # build a complete synthetic basic-SegNet caffemodel and load it
    rng = np.random.default_rng(2)
    specs = [
        ("conv1", 3, 64, 7), ("conv2", 64, 64, 7),
        ("conv3", 64, 64, 7), ("conv4", 64, 64, 7),
        ("conv_decode4", 64, 64, 7), ("conv_decode3", 64, 64, 7),
        ("conv_decode2", 64, 64, 7), ("conv_decode1", 64, 64, 7),
        ("dense_softmax_inner_prod", 64, 15, 1),
    ]
    layers = []
    expect = {}
    for name, cin, cout, k in specs:
        w = rng.normal(size=(cout, cin, k, k)).astype(np.float32)
        b = rng.normal(size=(cout,)).astype(np.float32)
        layers.append((name, "Convolution", [w, b]))
        expect[name] = (w, b)
    path = tmp_path / "model.caffemodel"
    path.write_bytes(encode_net(layers))

    loaded = caffe_io.load_segnet_params(str(path), "basic")
    init = segnet.init_params(
        segnet.SegNet(variant="basic"), jax.random.key(0), 32, 64
    )
    merged = caffe_io.merge_params(init, loaded)
    for name, (w, b) in expect.items():
        got = np.asarray(merged["params"][name]["kernel"])
        np.testing.assert_array_equal(
            got, np.transpose(w, (2, 3, 1, 0))
        )
        np.testing.assert_array_equal(
            np.asarray(merged["params"][name]["bias"]), b
        )
    # merged params actually run
    model = segnet.SegNet(variant="basic")
    probs = model.apply(
        merged,
        np.zeros((32, 64, 3), np.float32),
        train=False,
    )
    assert probs.shape == (32, 64, 15)


def test_bn_layers_load():
    rng = np.random.default_rng(3)
    scale = rng.normal(size=(64,)).astype(np.float32)
    shift = rng.normal(size=(64,)).astype(np.float32)
    raw = encode_net([("conv1_1_bn", "BN", [scale, shift])])
    layers = caffe_io.parse_caffemodel(raw)
    out = caffe_io.bn_to_flax(layers["conv1_1_bn"])
    np.testing.assert_array_equal(out["scale"], scale)
    np.testing.assert_array_equal(out["shift"], shift)
    np.testing.assert_array_equal(out["mean"], np.zeros(64))
    np.testing.assert_array_equal(out["var"], np.ones(64))


def test_shape_mismatch_raises(tmp_path):
    rng = np.random.default_rng(4)
    w = rng.normal(size=(32, 3, 5, 5)).astype(np.float32)  # wrong shape
    path = tmp_path / "bad.caffemodel"
    path.write_bytes(encode_net([("conv1", "Convolution", [w])]))
    loaded = caffe_io.load_segnet_params(str(path), "basic")
    init = segnet.init_params(
        segnet.SegNet(variant="basic"), jax.random.key(0), 32, 64
    )
    with pytest.raises(ValueError, match="shape"):
        caffe_io.merge_params(init, loaded)


def test_writer_roundtrip(tmp_path):
    """save_segnet_params -> load_segnet_params -> merge_params must
    reproduce the full basic-variant tree bit-exactly (the writer is
    the loader's inverse; the reference only loads,
    bayesian_segnet.cpp:59-61)."""
    init = segnet.init_params(
        segnet.SegNet(variant="basic"), jax.random.key(3), 32, 64
    )
    # make BN stats non-trivial so the 4-blob form is exercised
    p = jax.tree.map(np.asarray, init)
    for name, sub in p["params"].items():
        if "mean" in sub:
            sub["mean"] = sub["mean"] + 0.25
            sub["var"] = sub["var"] * 1.5
    path = tmp_path / "rt.caffemodel"
    caffe_io.save_segnet_params(str(path), p)
    loaded = caffe_io.load_segnet_params(str(path), "basic")
    merged = caffe_io.merge_params(init, loaded)
    flat_a = jax.tree_util.tree_leaves_with_path(p)
    flat_b = jax.tree_util.tree_leaves_with_path(merged)
    assert len(flat_a) == len(flat_b)
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
