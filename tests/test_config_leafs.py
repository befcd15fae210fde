"""Every shipped training-config leaf must instantiate through the same paths
train.py uses: default.yaml ⊕ leaf merge, model block → StarVectorConfig, and
data targets resolving to real dataset classes (reference configs/models/* —
one counterpart per reference leaf)."""

import os
import glob

import pytest

from starvector_tpu.config import get_obj_from_str, load_yaml, merge
from starvector_tpu.data.base import SVGDatasetBase
from starvector_tpu.models.builder import config_from_yaml_block

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODELS_DIR = os.path.join(REPO, "configs", "models")
DEFAULT = os.path.join(MODELS_DIR, "default.yaml")

LEAFS = sorted(
    p for p in glob.glob(os.path.join(MODELS_DIR, "*", "*.yaml"))
)

# the reference's per-model×dataset matrix (reference configs/models/):
# every one of these must have a same-named counterpart here
REFERENCE_MATRIX = {
    "starvector-1b": [
        "im2svg-emoji", "im2svg-fonts", "im2svg-icons", "im2svg-stack",
        "text2svg-figr", "text2svg-stack",
    ],
    "starvector-8b": [
        "im2svg-emoji", "im2svg-fonts", "im2svg-fonts-simple", "im2svg-icons",
        "im2svg-stack", "text2svg-figr", "text2svg-stack",
    ],
}


def test_full_reference_leaf_matrix_present():
    have = {
        (os.path.basename(os.path.dirname(p)),
         os.path.splitext(os.path.basename(p))[0])
        for p in LEAFS
    }
    missing = [
        f"{fam}/{leaf}.yaml"
        for fam, leafs in REFERENCE_MATRIX.items()
        for leaf in leafs
        if (fam, leaf) not in have
    ]
    assert not missing, f"missing config leafs: {missing}"


@pytest.mark.parametrize("leaf", LEAFS, ids=lambda p: os.path.relpath(p, MODELS_DIR))
def test_leaf_instantiates(leaf):
    cfg = merge(load_yaml(DEFAULT), load_yaml(leaf))
    family = os.path.basename(os.path.dirname(leaf))
    name = os.path.splitext(os.path.basename(leaf))[0]

    # model block → StarVectorConfig via the builder's mapping
    mcfg = config_from_yaml_block(cfg["model"].to_dict())
    if family == "starvector-8b":
        assert mcfg.decoder == "starcoder2"
        assert mcfg.image_encoder_type == "siglip_384"
        assert mcfg.max_length_train == 16000
    else:
        assert mcfg.decoder == "gpt_bigcode"
        assert mcfg.image_encoder_type == "clip"
    assert mcfg.task == ("text2svg" if name.startswith("text2svg") else "im2svg")

    # data targets resolve to dataset classes without instantiating
    # (instantiation hits the HF hub; class resolution is the config contract)
    for split in ("train", "val"):
        block = cfg["data"][split]
        dataset_cls = get_obj_from_str(block["target"])
        assert issubclass(dataset_cls, SVGDatasetBase)
        assert "dataset_name" in block["params"]
        assert block["params"]["split"] in ("train", "test")

    # mesh + training blocks sane after the merge
    assert cfg["training"]["lr"] > 0
    assert cfg["mesh"]["fsdp"] != 0


def test_chat_template_exists_and_concatenates():
    path = os.path.join(REPO, "configs", "chat-template.jinja")
    with open(path) as f:
        template = f.read()
    # reference configs/chat-template.jinja: plain content concatenation
    try:
        import jinja2
    except ImportError:
        pytest.skip("jinja2 unavailable")
    rendered = jinja2.Template(template).render(
        messages=[{"content": "<svg"}, {"content": " fill='red'"}]
    )
    assert rendered.strip() == "<svg fill='red'"


SERVE_DIR = os.path.join(REPO, "configs", "generation", "serve")
AUDITED_SERVE_LEAFS = sorted(
    p for p in glob.glob(os.path.join(SERVE_DIR, "*", "*.yaml"))
    if "hbm_proof_case" in open(p).read()
)


def test_audited_serve_leafs_exist():
    """Both v5e-8 serving geometries proven in HBM_PROOF.json ship as
    launchable leafs (VERDICT r4 #6; reference
    configs/generation/vllm/starvector-8b/im2svg.yaml:32)."""
    names = {os.path.basename(p) for p in AUDITED_SERVE_LEAFS}
    assert {"im2svg-tp4dp2.yaml", "im2svg-tp8-int8kv.yaml"} <= names


@pytest.mark.parametrize("leaf_path", AUDITED_SERVE_LEAFS,
                         ids=[os.path.basename(p) for p in AUDITED_SERVE_LEAFS])
def test_serve_leaf_matches_hbm_proof_case(leaf_path):
    """Leaf ⇄ HBM_PROOF.json consistency: the mesh axes, batch, context
    length, and KV dtype a leaf launches must be exactly the audited
    geometry, and the audited case must actually fit a 16 GiB chip —
    otherwise the leaf advertises an unproven (or disproven) recipe."""
    import json

    from starvector_tpu.serve.worker import serve_kwargs_from_leaf

    leaf = load_yaml(leaf_path)
    kw = serve_kwargs_from_leaf(leaf)
    case_name = kw["hbm_proof_case"]
    assert case_name, f"{leaf_path} lacks serve.hbm_proof_case"

    proof = json.load(open(os.path.join(REPO, "HBM_PROOF.json")))
    cases = {r["case"]: r for r in proof["results"] if "case" in r}
    assert case_name in cases, f"{case_name} not in HBM_PROOF.json"
    case = cases[case_name]
    assert "error" not in case, f"leaf points at an OOM negative: {case_name}"
    assert case["fits_16gib"] is True
    assert kw["max_batch"] == case["batch"]
    assert kw["max_len"] == case["cache_max_len"]
    leaf_kv = "int8" if kw["kv_cache_dtype"] is not None else "bfloat16"
    assert leaf_kv == case["kv_dtype"]
    # mesh axes ⇄ the case's mesh name (tp4xdp2 → tensor=4 × data=2, ...)
    axes = kw["mesh_axes"]
    mesh_tag = case["mesh"].split("-")[0]          # strip "-int8kv" suffix
    expect = {}
    for part, axis in (("tp", "tensor"), ("dp", "data")):
        for tok in mesh_tag.split("x"):
            if tok.startswith(part):
                expect[axis] = int(tok[len(part):])
    for axis, n in expect.items():
        assert axes.get(axis, 1) == n, (axis, axes, case["mesh"])
    import numpy as _np

    assert _np.prod(list(axes.values() or [1])) == _np.prod(
        list(expect.values() or [1]))


def test_serve_kwargs_from_leaf_rejects_unknown_kv():
    from starvector_tpu.serve.worker import serve_kwargs_from_leaf

    with pytest.raises(ValueError, match="kv_cache_dtype"):
        serve_kwargs_from_leaf({"serve": {"kv_cache_dtype": "fp8"}})
