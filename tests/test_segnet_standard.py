"""Standard-variant SegNet: full synthetic caffemodel round-trip
including Caffe 'BN' layers through merge_params."""

import jax
import numpy as np

from sivo_tpu.models import caffe_io, segnet
from tests.test_caffe_io import encode_net


def test_standard_model_loads_with_bn(tmp_path):
    rng = np.random.default_rng(0)
    model = segnet.SegNet(variant="standard")
    init = segnet.init_params(model, jax.random.key(0), 32, 64)
    layers = []
    expect_scale = {}
    for name, sub in init["params"].items():
        if name.endswith("_bn"):
            c = np.asarray(sub["scale"]).shape[0]
            scale = rng.normal(1, 0.1, c).astype(np.float32)
            shift = rng.normal(0, 0.1, c).astype(np.float32)
            layers.append((name, "BN", [scale, shift]))
            expect_scale[name] = scale
        else:
            k = np.asarray(sub["kernel"])
            kh, kw, cin, cout = k.shape
            w = rng.normal(0, 0.05, (cout, cin, kh, kw)).astype(
                np.float32
            )
            b = rng.normal(0, 0.01, cout).astype(np.float32)
            layers.append((name, "Convolution", [w, b]))
    path = tmp_path / "standard.caffemodel"
    path.write_bytes(encode_net(layers))

    loaded = caffe_io.load_segnet_params(str(path), "standard")
    merged = caffe_io.merge_params(init, loaded)
    for name, scale in expect_scale.items():
        np.testing.assert_array_equal(
            np.asarray(merged["params"][name]["scale"]), scale
        )
        # merged-BN form: stats stay identity
        np.testing.assert_array_equal(
            np.asarray(merged["params"][name]["var"]),
            np.ones_like(scale),
        )
    probs = model.apply(
        merged, np.zeros((32, 64, 3), np.float32), train=False
    )
    assert probs.shape == (32, 64, 15)
    assert np.isfinite(np.asarray(probs)).all()
