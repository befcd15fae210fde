"""Training integration: sharded train steps reduce the loss on a tiny
overfit task; checkpoint save/rotate/resume round-trips (SURVEY.md §4
tier 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from starvector_tpu.models import starvector as sv
from starvector_tpu.models.tokenizer import build_test_tokenizer
from starvector_tpu.ops.layers import DTypePolicy
from starvector_tpu.parallel import MeshConfig, create_mesh
from starvector_tpu.parallel.mesh import batch_sharding
from starvector_tpu.train import checkpoint as ckpt
from starvector_tpu.train.optim import build_optimizer, cosine_schedule_with_warmup, freeze_mask
from starvector_tpu.train.step import make_train_step, shard_train_state

F32 = DTypePolicy(compute_dtype=jnp.float32)


def make_setup(adapter_norm="layer_norm"):
    cfg = sv.tiny_config(adapter_norm=adapter_norm)
    params = sv.init_params(cfg, jax.random.PRNGKey(0))
    tok = build_test_tokenizer()
    B, S = 4, 12
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(B, cfg.image_size, cfg.image_size, 3), jnp.float32),
        "svg_ids": jnp.asarray(rng.randint(1, cfg.llm.vocab_size, (B, S)), jnp.int32),
        "svg_mask": jnp.ones((B, S), jnp.int32),
    }
    return cfg, params, tok, batch


@pytest.mark.slow
def test_loss_decreases_sharded():
    cfg, params, tok, batch = make_setup()
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    tx = build_optimizer(params, lr=3e-3, warmup_steps=0, total_steps=100)
    with jax.set_mesh(mesh):
        params, opt_state = shard_train_state(params, tx, mesh)
        db = {
            "image": jax.device_put(batch["image"], batch_sharding(mesh, 3)),
            "svg_ids": jax.device_put(batch["svg_ids"], batch_sharding(mesh, 1)),
            "svg_mask": jax.device_put(batch["svg_mask"], batch_sharding(mesh, 1)),
        }
        step = make_train_step(cfg, tx, tok.pad_token_id, policy=F32, remat=True)
        losses = []
        rng = jax.random.PRNGKey(0)
        for i in range(8):
            rng, r = jax.random.split(rng)
            params, opt_state, m = step(params, opt_state, db, r)
            losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses


@pytest.mark.slow
def test_batchnorm_stats_update_during_training():
    cfg, params, tok, batch = make_setup(adapter_norm="batch_norm")
    tx = build_optimizer(params, lr=1e-3, total_steps=10)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, tok.pad_token_id, policy=F32, remat=False)
    before = np.asarray(params["image_projection"]["norm"]["running_mean"]).copy()
    params, opt_state, _ = step(params, opt_state, batch, jax.random.PRNGKey(0))
    after = np.asarray(params["image_projection"]["norm"]["running_mean"])
    assert not np.allclose(before, after)


@pytest.mark.slow
def test_freeze_mask_blocks_updates():
    cfg, params, tok, batch = make_setup()
    tx = build_optimizer(
        params, lr=1e-2, total_steps=10,
        train_image_encoder=False, train_LLM=True, train_connector=True,
    )
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, tok.pad_token_id, policy=F32, remat=False)
    before = jax.tree_util.tree_map(np.asarray, params["image_encoder"])
    wte_before = np.asarray(params["svg_transformer"]["wte"]).copy()
    # params/opt_state are donated by the jitted step — snapshot first
    params2, _, _ = step(params, opt_state, batch, jax.random.PRNGKey(0))
    after = params2["image_encoder"]
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        before, after,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0
    # but the LLM did move
    moved = float(
        np.abs(np.asarray(params2["svg_transformer"]["wte"]) - wte_before).max()
    )
    assert moved > 0


@pytest.mark.slow
def test_remat_dots_grads_match_full_remat():
    """remat="dots" (save matmul outputs, recompute elementwise) must be a
    pure scheduling choice: loss and grads bit-match remat=True/False.
    slow-marked (>15 s: three full backward compiles of the same graph)."""
    cfg, params, tok, batch = make_setup()

    def grads_for(remat):
        def loss(p):
            out = sv.loss_fn_with_bn_stats(
                p, cfg, batch, tok.pad_token_id, policy=F32,
                dropout_rng=jax.random.PRNGKey(0), remat=remat,
            )
            return out[0]
        l, g = jax.jit(jax.value_and_grad(loss))(params)
        return float(l), g

    l_full, g_full = grads_for(True)
    for mode in ("dots", "dots_slim", "dots_flash"):
        l_dots, g_dots = grads_for(mode)
        assert l_full == pytest.approx(l_dots, rel=1e-6), mode
        for a, b in zip(jax.tree_util.tree_leaves(g_full),
                        jax.tree_util.tree_leaves(g_dots)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6,
                                       err_msg=mode)


def test_grad_dtype_step_shapes_and_dtypes():
    """Default-tier wiring check (eval_shape — no compile): with
    grad_dtype=bf16 the step still returns fp32 master params and an fp32
    opt state; int leaves (BN counters etc.) are untouched by the cast."""
    cfg, params, tok, batch = make_setup()
    bf16 = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)
    tx = build_optimizer(params, lr=1e-3, warmup_steps=0, total_steps=10)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, tok.pad_token_id, policy=bf16,
                           remat=False, grad_dtype=jnp.bfloat16)
    p2, o2, m = jax.eval_shape(step, params, opt_state, batch,
                               jax.random.PRNGKey(0))
    for ref, out in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(p2)):
        assert out.dtype == ref.dtype and out.shape == ref.shape
    for ref, out in zip(jax.tree_util.tree_leaves(opt_state),
                        jax.tree_util.tree_leaves(o2)):
        assert out.dtype == ref.dtype
    assert m["loss"].dtype == jnp.float32


@pytest.mark.slow
def test_grad_dtype_bf16_matches_fp32_step():
    """grad_dtype=bf16 (the AMP layout: bf16 backward grad stacks, fp32
    master + optimizer) must stay numerically close to the fp32-grad step —
    the only difference is one bf16 quantize per gradient element — and the
    master params must remain fp32 after the update."""
    cfg, params, tok, batch = make_setup()
    bf16 = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)

    def one_step(grad_dtype):
        p = jax.tree_util.tree_map(jnp.copy, params)
        tx = build_optimizer(p, lr=1e-3, warmup_steps=0, total_steps=10)
        opt_state = tx.init(p)
        step = make_train_step(cfg, tx, tok.pad_token_id, policy=bf16,
                               remat=False, grad_dtype=grad_dtype)
        p2, _, m = step(p, opt_state, batch, jax.random.PRNGKey(0))
        return p2, float(m["loss"]), float(m["grad_norm"])

    p_ref, loss_ref, gn_ref = one_step(None)
    p_amp, loss_amp, gn_amp = one_step(jnp.bfloat16)

    # losses come from the same bf16 forward → near-identical
    assert loss_amp == pytest.approx(loss_ref, rel=2e-2)
    # grad norm within bf16 rounding of the fp32-accumulated one
    assert gn_amp == pytest.approx(gn_ref, rel=5e-2)
    # masters stay fp32, and the update direction matches
    for a, b in zip(jax.tree_util.tree_leaves(p_amp),
                    jax.tree_util.tree_leaves(p_ref)):
        if jnp.issubdtype(a.dtype, jnp.floating):
            assert a.dtype == b.dtype
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0.1, atol=2.5e-3)


@pytest.mark.slow
def test_grad_dtype_bf16_loss_decreases():
    """Training with bf16 gradients still descends on the tiny overfit task
    (the knob that fits 8B at the reference 8192 context on 16 GiB chips,
    scripts/hbm_proof.py)."""
    cfg, params, tok, batch = make_setup()
    bf16 = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)
    tx = build_optimizer(params, lr=3e-3, warmup_steps=0, total_steps=100)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, tok.pad_token_id, policy=bf16,
                           remat=False, grad_dtype=jnp.bfloat16)
    losses = []
    rng = jax.random.PRNGKey(0)
    for _ in range(6):
        rng, r = jax.random.split(rng)
        params, opt_state, m = step(params, opt_state, batch, r)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses


def test_cosine_schedule():
    sched = cosine_schedule_with_warmup(1.0, warmup_steps=10, total_steps=110)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1.0) < 1e-6
    assert float(sched(5)) == pytest.approx(0.5)
    assert float(sched(110)) == pytest.approx(0.0, abs=1e-6)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    cfg, params, tok, batch = make_setup()
    tx = build_optimizer(params, lr=1e-3, total_steps=10)
    opt_state = tx.init(params)
    base = str(tmp_path / "ckpts")
    ckpt.save_checkpoint(base, 5, {"params": params, "opt_state": opt_state})
    ckpt.save_checkpoint(base, 10, {"params": params, "opt_state": opt_state},
                         total_limit=1)
    cps = ckpt.list_checkpoints(base)
    assert [s for s, _ in cps] == [10]  # rotation kept only the last
    last = ckpt.get_last_checkpoint(base)
    state = ckpt.restore_checkpoint(last, {"params": params, "opt_state": opt_state})
    np.testing.assert_array_equal(
        np.asarray(state["params"]["svg_transformer"]["wte"]),
        np.asarray(params["svg_transformer"]["wte"]),
    )
    assert ckpt.step_from_path(last) == 10


def test_freeze_mask_structure():
    cfg, params, _, _ = make_setup()
    mask = freeze_mask(
        params, train_image_encoder=False, train_LLM=True, train_connector=True
    )
    assert not any(jax.tree_util.tree_leaves(mask["image_encoder"]))
    assert all(jax.tree_util.tree_leaves(mask["svg_transformer"]))


def test_loader_multihost_sharding():
    """Each process gets a disjoint, identically-permuted slice (replaces
    the reference's DistributedSampler semantics)."""
    from starvector_tpu.models.tokenizer import build_test_tokenizer
    from starvector_tpu.train.loader import DataLoader

    class DS:
        def __len__(self):
            return 17

        def __getitem__(self, i):
            import numpy as np

            return {"image": np.zeros((4, 4, 3)), "svg": f"<svg>{i}</svg>",
                    "caption": "", "id": str(i)}

    tok = build_test_tokenizer()
    seen = []
    for pi in range(3):
        dl = DataLoader(DS(), tok, 2, shuffle=True, drop_last=False,
                        num_workers=1, seed=7, process_index=pi,
                        process_count=3)
        ids = [int(i) for b in dl for i in b["id"]]
        assert len(ids) > 0
        seen.append(set(ids))
    assert seen[0] | seen[1] | seen[2] == set(range(17))
    assert not (seen[0] & seen[1]) and not (seen[0] & seen[2]) \
        and not (seen[1] & seen[2])


class _IdxDS:
    def __init__(self, n=23):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"image": np.zeros((4, 4, 3)), "svg": f"<svg>{i}</svg>",
                "caption": "", "id": str(i)}


def _stream(dl, epochs=(0,), skip_in_first=0):
    """Consume the loader over the given epochs, returning the ordered id
    stream (one list entry per batch)."""
    out = []
    first = True
    for e in epochs:
        dl.set_epoch(e)
        if first and skip_in_first:
            dl.skip_first_batches(skip_in_first)
        first = False
        for b in dl:
            out.append([int(i) for i in b["id"]])
    return out


def test_resume_replays_no_batches():
    """Interrupt + resume consumes the IDENTICAL batch stream of the
    uninterrupted run: per-epoch seeded permutation + mid-epoch
    fast-forward (reference train/train.py:239-246 via
    accelerate.skip_first_batches)."""
    from starvector_tpu.models.tokenizer import build_test_tokenizer
    from starvector_tpu.train.loader import DataLoader

    tok = build_test_tokenizer()
    mk = lambda: DataLoader(_IdxDS(), tok, 4, shuffle=True, num_workers=1,
                            seed=3, process_index=0, process_count=1)

    # uninterrupted: two epochs
    full = _stream(mk(), epochs=(0, 1))
    steps_per_epoch = len(mk())
    assert steps_per_epoch == 5  # 23 // 4

    # "crash" after 3 steps of epoch 0 → a fresh loader resumes at step 3
    resumed = _stream(mk(), epochs=(0, 1), skip_in_first=3)
    assert resumed == full[3:]

    # permutations differ across epochs but reproduce within an epoch
    assert full[:steps_per_epoch] != full[steps_per_epoch:]
    assert _stream(mk(), epochs=(1,)) == full[steps_per_epoch:]


def test_optimizer_config_roundtrip():
    """A shipped leaf reproduces the reference optimizer recipe
    (reference train/util.py:132-151, configs/models/starvector-1b/
    im2svg-emoji.yaml:30-36): AdamW betas (0.95, 0.999), wd 1e-6,
    eps 1e-8, cosine schedule, lr_warmup_steps 10."""
    import os

    from starvector_tpu.config import load_yaml, merge
    from starvector_tpu.train.train import optimizer_kwargs_from_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = merge(
        load_yaml(os.path.join(repo, "configs/models/default.yaml")),
        load_yaml(os.path.join(repo, "configs/models/starvector-1b/im2svg-emoji.yaml")),
    )
    kw = optimizer_kwargs_from_config(cfg)
    assert kw["optimizer"] == "adamw"
    assert kw["betas"] == (0.95, 0.999)
    assert kw["weight_decay"] == pytest.approx(1e-6)
    assert kw["eps"] == pytest.approx(1e-8)
    assert kw["lr_scheduler"] == "cosine"
    assert kw["warmup_steps"] == 10
    assert kw["lr"] == pytest.approx(1e-5)
    assert kw["grad_accum_steps"] == 4

    # and the kwargs drive build_optimizer end-to-end
    cfgm, params, _, _ = make_setup()
    tx = build_optimizer(params, total_steps=100, **kw)
    assert tx.init(params) is not None


def test_lr_scheduler_variants():
    from starvector_tpu.train.optim import build_schedule

    lin = build_schedule("linear", 1.0, warmup_steps=10, total_steps=110)
    assert float(lin(5)) == pytest.approx(0.5)
    assert float(lin(10)) == pytest.approx(1.0)
    assert float(lin(60)) == pytest.approx(0.5)
    assert float(lin(110)) == pytest.approx(0.0, abs=1e-6)

    const = build_schedule("constant", 2.0, warmup_steps=4, total_steps=100)
    assert float(const(2)) == pytest.approx(1.0)
    assert float(const(50)) == pytest.approx(2.0)

    with pytest.raises(ValueError):
        build_schedule("nope", 1.0, 0, 10)


def test_opt_state_shardings_inherit_param_shardings():
    """Optimizer moments must land on their parameter's sharding, NOT be
    left to XLA propagation (zeros_like has no data dependence on params, so
    propagation replicates them — 3x per-chip optimizer memory at 8B scale;
    caught by the v5e-8 AOT audit, scripts/hbm_proof.py)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from starvector_tpu.models import starvector as sv
    from starvector_tpu.parallel import MeshConfig, create_mesh, make_param_shardings
    from starvector_tpu.train.step import opt_state_shardings

    cfg, params, _, _ = make_setup()
    mesh = create_mesh(MeshConfig(fsdp=4, tensor=2))
    shardings = make_param_shardings(params, sv.partition_rules(), mesh)
    tx = build_optimizer(params, lr=1e-3, total_steps=10)
    o_sh = opt_state_shardings(tx, params, shardings, mesh)

    # find the Adam mu subtree and compare against the param shardings
    flat_p = dict(jax.tree_util.tree_flatten_with_path(shardings)[0])
    flat_o = jax.tree_util.tree_flatten_with_path(o_sh)[0]
    matched = 0
    for path, sh in flat_o:
        assert isinstance(sh, NamedSharding)
        tail = tuple(str(k) for k in path)
        for p_path, p_sharding in flat_p.items():
            p_tail = tuple(str(k) for k in p_path)
            if tail[-len(p_tail):] == p_tail and sh.spec == p_sharding.spec \
                    and sh.spec != P():
                matched += 1
                break
    # the model has sharded matmul weights; their moments must be sharded too
    assert matched > 10, f"only {matched} opt-state leaves inherit shardings"

    # end-to-end: init with the explicit out_shardings and check a moment
    params_s = jax.tree_util.tree_map(jax.device_put, params, shardings)
    opt_state = jax.jit(tx.init, out_shardings=o_sh)(params_s)
    adam = [s for s in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
        if isinstance(x := s, optax.ScaleByAdamState)]
    assert adam, "no ScaleByAdamState found"
    mu_shardings = {
        str(l.sharding.spec)
        for l in jax.tree_util.tree_leaves(adam[0].mu)
        if hasattr(l, "sharding")
    }
    assert any(s != "PartitionSpec()" for s in mu_shardings), mu_shardings


@pytest.mark.slow
def test_train_main_end_to_end_with_resume(tmp_path):
    """Drive train.train.main itself (config -> datasets -> mesh -> optax ->
    epochs -> checkpoints) on the in-memory ToySVGDataset, interrupt it, and
    resume: the resumed run must pick up the step counter and train to
    completion without replaying batches (reference train/train.py:66-271)."""
    from starvector_tpu.config import ConfigNode
    from starvector_tpu.train.train import main

    def make_cfg(steps):
        return ConfigNode({
            "project": {"name": "toy", "out_dir": str(tmp_path / "run")},
            "mesh": {"replica": 1, "data": 2, "fsdp": -1, "sequence": 1,
                     "stage": 1, "tensor": 1},
            "model": {"preset": "tiny"},   # toy geometry, full wiring
            "training": {
                "steps": steps, "epochs": 4, "lr": 1e-3,
                "lr_warmup_steps": 0, "log_every": 1, "bf16": False,
                "checkpointing_steps": 2, "checkpoints_total_limit": 2,
                "seed": 0, "gradient_checkpointing": False,
            },
            "data": {
                "batch_size": 2, "max_length": 64, "num_workers": 1,
                "train": {
                    "target": "starvector_tpu.data.datasets.ToySVGDataset",
                    "params": {"num_samples": 8, "im_size": 28},
                },
            },
        })

    # phase 1: "crash" after 3 steps (steps=3 ends the run mid-epoch-2)
    main(make_cfg(3))
    from starvector_tpu.train import checkpoint as ckpt_mod

    out_dir = str(tmp_path / "run")
    last = ckpt_mod.get_last_checkpoint(out_dir)
    assert last is not None
    # ckpt at step 2 (ckpt_every=2) + the final-step save at step 3
    assert ckpt_mod.step_from_path(last) == 3

    # the run dir records its identity: config snapshot + exp id + code
    # snapshot (reference starvector/util.py:98-146, :230-270)
    assert (tmp_path / "run" / "config.yaml").exists()
    assert (tmp_path / "run" / "experiment_id.txt").exists()
    assert (tmp_path / "run" / "code_snapshot" / "starvector_tpu").is_dir()
    # ... and each checkpoint carries the config it was trained with
    import os as _os

    assert _os.path.exists(_os.path.join(last, "config.yaml"))

    # phase 2: resume and finish to 6 total steps
    main(make_cfg(6))
    last = ckpt_mod.get_last_checkpoint(out_dir)
    assert ckpt_mod.step_from_path(last) == 6

    # metrics jsonl carries a contiguous resumed step sequence
    import json as _json
    recs = [
        _json.loads(l)
        for l in open(tmp_path / "run" / "metrics.jsonl")
        if "loss" in l
    ]
    steps = [r["step"] for r in recs if "loss" in r]
    assert steps[-1] == 6
    assert 3 in steps and 4 in steps  # resume continued, not restarted


def test_checkpoint_config_snapshot_and_reimposition(tmp_path):
    """save_checkpoint(config=...) writes config.yaml into checkpoint-<step>/
    and resume re-imposes the saved `model` block over an edited live config
    (reference starvector/util.py:284-291) — a resumed run cannot silently
    change architecture."""
    from starvector_tpu.config import ConfigNode
    from starvector_tpu.train.train import reimpose_checkpoint_model_block

    saved_cfg = ConfigNode({
        "model": {"preset": "tiny", "attn_impl": "flash", "dropout": 0.1},
        "training": {"lr": 1e-3, "resume": True},
    })
    state = {"params": {"w": jnp.zeros((2, 2))},
             "opt_state": {"mu": jnp.zeros((2, 2))}}
    base = str(tmp_path / "run")
    path = ckpt.save_checkpoint(base, 7, state, config=saved_cfg)
    assert (tmp_path / "run" / "checkpoint-7" / "config.yaml").exists()
    assert ckpt.load_checkpoint_config(path).model.attn_impl == "flash"

    # live config arrives with a shape-compatible architecture edit
    live = ConfigNode({
        "model": {"preset": "tiny", "attn_impl": "xla", "dropout": 0.0},
        "training": {"lr": 5e-4, "resume": True},
    })
    last = reimpose_checkpoint_model_block(live, base)
    assert last == path
    assert live.model.attn_impl == "flash"      # saved block won
    assert live.model.dropout == 0.1
    assert live.get_path("training.lr") == 5e-4  # non-model keys untouched

    # resume disabled -> live config is left alone
    live2 = ConfigNode({
        "model": {"attn_impl": "xla"}, "training": {"resume": False},
    })
    reimpose_checkpoint_model_block(live2, base)
    assert live2.get_path("model.attn_impl") == "xla"

    # pre-snapshot checkpoints (no config.yaml) resume as before
    base2 = str(tmp_path / "old")
    ckpt.save_checkpoint(base2, 3, state)
    live3 = ConfigNode({
        "model": {"attn_impl": "xla"}, "training": {"resume": True},
    })
    assert reimpose_checkpoint_model_block(live3, base2) is not None
    assert live3.get_path("model.attn_impl") == "xla"
