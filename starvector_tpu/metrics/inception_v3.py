"""InceptionV3 pool3 feature extractor (the real FID network) — JAX, NHWC.

Parity target: the reference vendors pytorch-fid's InceptionV3 and computes
FID over its 2048-dim pool3 features (reference:
starvector/metrics/inception.py:16-340, compute_fid.py:15-145). This is the
same architecture re-implemented functionally: BasicConv2d (conv, no bias →
BatchNorm eps 1e-3 → relu) and the Inception A/B/C/D/E towers, with the
FID-variant average pooling (count_include_pad=False — pytorch-fid's
FIDInception{A,C,E} patch) and the [-1, 1] input scaling + bilinear 299
resize of pytorch-fid.

Weights load from a pytorch-fid / torchvision state dict placed under
STARVECTOR_METRICS_DIR (zero-egress image). `init_random` builds a
random-weight net so the architecture is exercised by tests."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-3


# ---------------------------------------------------------------------------
# architecture table: name -> (cin, cout, (kh, kw), stride, (ph, pw))
# ---------------------------------------------------------------------------

def _stem():
    return [
        ("Conv2d_1a_3x3", 3, 32, (3, 3), 2, (0, 0)),
        ("Conv2d_2a_3x3", 32, 32, (3, 3), 1, (0, 0)),
        ("Conv2d_2b_3x3", 32, 64, (3, 3), 1, (1, 1)),
        ("maxpool", None, None, None, None, None),
        ("Conv2d_3b_1x1", 64, 80, (1, 1), 1, (0, 0)),
        ("Conv2d_4a_3x3", 80, 192, (3, 3), 1, (0, 0)),
        ("maxpool", None, None, None, None, None),
    ]


def _inception_a(cin, pool_features):
    return {
        "branch1x1": [(cin, 64, (1, 1), 1, (0, 0))],
        "branch5x5": [(cin, 48, (1, 1), 1, (0, 0)),
                      (48, 64, (5, 5), 1, (2, 2))],
        "branch3x3dbl": [(cin, 64, (1, 1), 1, (0, 0)),
                         (64, 96, (3, 3), 1, (1, 1)),
                         (96, 96, (3, 3), 1, (1, 1))],
        "branch_pool": [(cin, pool_features, (1, 1), 1, (0, 0))],
    }


def _inception_b(cin):
    return {
        "branch3x3": [(cin, 384, (3, 3), 2, (0, 0))],
        "branch3x3dbl": [(cin, 64, (1, 1), 1, (0, 0)),
                         (64, 96, (3, 3), 1, (1, 1)),
                         (96, 96, (3, 3), 2, (0, 0))],
    }


def _inception_c(cin, c7):
    return {
        "branch1x1": [(cin, 192, (1, 1), 1, (0, 0))],
        "branch7x7": [(cin, c7, (1, 1), 1, (0, 0)),
                      (c7, c7, (1, 7), 1, (0, 3)),
                      (c7, 192, (7, 1), 1, (3, 0))],
        "branch7x7dbl": [(cin, c7, (1, 1), 1, (0, 0)),
                         (c7, c7, (7, 1), 1, (3, 0)),
                         (c7, c7, (1, 7), 1, (0, 3)),
                         (c7, c7, (7, 1), 1, (3, 0)),
                         (c7, 192, (1, 7), 1, (0, 3))],
        "branch_pool": [(cin, 192, (1, 1), 1, (0, 0))],
    }


def _inception_d(cin):
    return {
        "branch3x3": [(cin, 192, (1, 1), 1, (0, 0)),
                      (192, 320, (3, 3), 2, (0, 0))],
        "branch7x7x3": [(cin, 192, (1, 1), 1, (0, 0)),
                        (192, 192, (1, 7), 1, (0, 3)),
                        (192, 192, (7, 1), 1, (3, 0)),
                        (192, 192, (3, 3), 2, (0, 0))],
    }


def _inception_e(cin):
    # every entry is a single conv matching its torch module name exactly
    return {
        "branch1x1": [(cin, 320, (1, 1), 1, (0, 0))],
        "branch3x3_1": [(cin, 384, (1, 1), 1, (0, 0))],
        "branch3x3_2a": [(384, 384, (1, 3), 1, (0, 1))],
        "branch3x3_2b": [(384, 384, (3, 1), 1, (1, 0))],
        "branch3x3dbl_1": [(cin, 448, (1, 1), 1, (0, 0))],
        "branch3x3dbl_2": [(448, 384, (3, 3), 1, (1, 1))],
        "branch3x3dbl_3a": [(384, 384, (1, 3), 1, (0, 1))],
        "branch3x3dbl_3b": [(384, 384, (3, 1), 1, (1, 0))],
        "branch_pool": [(cin, 192, (1, 1), 1, (0, 0))],
    }


_MIXED = [
    ("Mixed_5b", _inception_a(192, 32), "A"),
    ("Mixed_5c", _inception_a(256, 64), "A"),
    ("Mixed_5d", _inception_a(288, 64), "A"),
    ("Mixed_6a", _inception_b(288), "B"),
    ("Mixed_6b", _inception_c(768, 128), "C"),
    ("Mixed_6c", _inception_c(768, 160), "C"),
    ("Mixed_6d", _inception_c(768, 160), "C"),
    ("Mixed_6e", _inception_c(768, 192), "C"),
    ("Mixed_7a", _inception_d(768), "D"),
    ("Mixed_7b", _inception_e(1280), "E"),
    ("Mixed_7c", _inception_e(2048), "E"),
]

FEATURE_DIM = 2048


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def _bc_init(rng, cin, cout, k, dtype):
    w = jax.random.normal(rng, (*k, cin, cout), dtype) * (
        (k[0] * k[1] * cin) ** -0.5
    )
    return {
        "conv": {"kernel": w},
        "bn": {
            "scale": jnp.ones((cout,), dtype),
            "bias": jnp.zeros((cout,), dtype),
            "mean": jnp.zeros((cout,), dtype),
            "var": jnp.ones((cout,), dtype),
        },
    }


def init_random(rng: jax.Array, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 256))
    params: dict = {}
    for name, cin, cout, k, _, _ in _stem():
        if name == "maxpool":
            continue
        params[name] = _bc_init(next(keys), cin, cout, k, dtype)
    for name, spec, _ in _MIXED:
        params[name] = {
            br: [_bc_init(next(keys), cin, cout, k, dtype)
                 for cin, cout, k, _, _ in convs]
            for br, convs in spec.items()
        }
    return params


def from_torch_state_dict(sd: dict, dtype=jnp.float32) -> dict:
    """Convert a pytorch-fid / torchvision inception_v3 state dict."""

    def bc(name):
        w = np.asarray(sd[name + ".conv.weight"], np.float32)
        return {
            "conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype)},
            "bn": {
                "scale": jnp.asarray(np.asarray(sd[name + ".bn.weight"]), dtype),
                "bias": jnp.asarray(np.asarray(sd[name + ".bn.bias"]), dtype),
                "mean": jnp.asarray(np.asarray(sd[name + ".bn.running_mean"]), dtype),
                "var": jnp.asarray(np.asarray(sd[name + ".bn.running_var"]), dtype),
            },
        }

    params: dict = {}
    for name, *_ in _stem():
        if name != "maxpool":
            params[name] = bc(name)
    for name, spec, _ in _MIXED:
        block = {}
        for br, convs in spec.items():
            # torch names: branch lists are sequential modules branchX_1..N
            # except single-conv branches which use the bare name
            ps = []
            for i in range(len(convs)):
                tname = f"{name}.{br}" if len(convs) == 1 else f"{name}.{br}_{i + 1}"
                ps.append(bc(tname))
            block[br] = ps
        params[name] = block
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _basic_conv(p, x, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, p["conv"]["kernel"].astype(x.dtype), (stride, stride),
        [(pad[0], pad[0]), (pad[1], pad[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    bn = p["bn"]
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + _BN_EPS)
    out = (out.astype(jnp.float32) - bn["mean"]) * inv * bn["scale"] + bn["bias"]
    return jax.nn.relu(out).astype(x.dtype)


def _run_branch(ps, specs, x):
    for p, (_, _, k, stride, pad) in zip(ps, specs):
        x = _basic_conv(p, x, stride, pad)
    return x


def _maxpool3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _maxpool3s1(x):
    """3x3 stride-1 pad-1 max pool — pytorch-fid's FIDInceptionE_2 uses MAX
    pooling for Mixed_7c's pool branch (reference inception.py:310-345),
    unlike every other pool branch."""
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), pad
    )


def _avgpool3s1_nocountpad(x):
    """3x3 stride-1 pad-1 average pool with count_include_pad=False — the
    pytorch-fid FIDInception patch (reference inception.py:212-228)."""
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), pad
    )
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), pad
    )
    return s / cnt


@functools.partial(jax.jit, static_argnames=())
def features(params: dict, x: jax.Array) -> jax.Array:
    """x: (B, 299, 299, 3) in [-1, 1] → (B, 2048) pool3 features."""
    for name, _, _, k, stride, pad in _stem():
        if name == "maxpool":
            x = _maxpool3s2(x)
        else:
            x = _basic_conv(params[name], x, stride, pad)
    for name, spec, kind in _MIXED:
        p = params[name]
        if kind == "A":
            b1 = _run_branch(p["branch1x1"], spec["branch1x1"], x)
            b2 = _run_branch(p["branch5x5"], spec["branch5x5"], x)
            b3 = _run_branch(p["branch3x3dbl"], spec["branch3x3dbl"], x)
            bp = _run_branch(
                p["branch_pool"], spec["branch_pool"], _avgpool3s1_nocountpad(x)
            )
            x = jnp.concatenate([b1, b2, b3, bp], axis=-1)
        elif kind == "B":
            b1 = _run_branch(p["branch3x3"], spec["branch3x3"], x)
            b2 = _run_branch(p["branch3x3dbl"], spec["branch3x3dbl"], x)
            x = jnp.concatenate([b1, b2, _maxpool3s2(x)], axis=-1)
        elif kind == "C":
            b1 = _run_branch(p["branch1x1"], spec["branch1x1"], x)
            b2 = _run_branch(p["branch7x7"], spec["branch7x7"], x)
            b3 = _run_branch(p["branch7x7dbl"], spec["branch7x7dbl"], x)
            bp = _run_branch(
                p["branch_pool"], spec["branch_pool"], _avgpool3s1_nocountpad(x)
            )
            x = jnp.concatenate([b1, b2, b3, bp], axis=-1)
        elif kind == "D":
            b1 = _run_branch(p["branch3x3"], spec["branch3x3"], x)
            b2 = _run_branch(p["branch7x7x3"], spec["branch7x7x3"], x)
            x = jnp.concatenate([b1, b2, _maxpool3s2(x)], axis=-1)
        else:  # E
            b1 = _run_branch(p["branch1x1"], spec["branch1x1"], x)
            m = _run_branch(p["branch3x3_1"], spec["branch3x3_1"], x)
            b2 = jnp.concatenate([
                _run_branch(p["branch3x3_2a"], spec["branch3x3_2a"], m),
                _run_branch(p["branch3x3_2b"], spec["branch3x3_2b"], m),
            ], axis=-1)
            m = _run_branch(p["branch3x3dbl_1"], spec["branch3x3dbl_1"], x)
            m = _run_branch(p["branch3x3dbl_2"], spec["branch3x3dbl_2"], m)
            b3 = jnp.concatenate([
                _run_branch(p["branch3x3dbl_3a"], spec["branch3x3dbl_3a"], m),
                _run_branch(p["branch3x3dbl_3b"], spec["branch3x3dbl_3b"], m),
            ], axis=-1)
            # Mixed_7b = FIDInceptionE_1 (avg, count_include_pad=False);
            # Mixed_7c = FIDInceptionE_2 (MAX) — pytorch-fid parity
            pool_in = (_maxpool3s1(x) if name == "Mixed_7c"
                       else _avgpool3s1_nocountpad(x))
            bp = _run_branch(p["branch_pool"], spec["branch_pool"], pool_in)
            x = jnp.concatenate([b1, b2, b3, bp], axis=-1)
    return jnp.mean(x, axis=(1, 2))  # global average pool → (B, 2048)


def preprocess(pil_images, size: int = 299) -> jnp.ndarray:
    """PIL → (B, 299, 299, 3) in [-1, 1] (pytorch-fid: bilinear resize then
    2x - 1, reference inception.py:119-126)."""
    arrs = []
    for im in pil_images:
        im = im.convert("RGB").resize((size, size))
        arrs.append(np.asarray(im, np.float32) / 255.0 * 2.0 - 1.0)
    return jnp.asarray(np.stack(arrs))
