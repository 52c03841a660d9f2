import jax
import jax.numpy as jnp
import pytest

from clap2diffusion_tpu.core import Config, load_config, make_mesh
from clap2diffusion_tpu.core.config import apply_overrides
from clap2diffusion_tpu.core.mesh import shard_batch


def test_default_config_contract():
    cfg = Config()
    # The reference's behavioral contract (SURVEY.md section 2.9).
    assert cfg.condition.clap_dim == 512
    assert cfg.condition.token_dim == 768
    assert cfg.condition.num_tokens == 10
    assert cfg.condition.num_output_tokens == 77
    assert cfg.condition.num_adapter_tokens == 16
    assert cfg.condition.audio_norm_target == 60.0
    assert cfg.diffusion.scheduler.guidance_scale == 7.5
    assert cfg.diffusion.scheduler.num_inference_steps == 50
    assert cfg.clap.frontend.sample_rate == 48_000
    assert cfg.train.stage1.steps == 3000 and cfg.train.stage1.lr == 1e-4
    assert cfg.train.stage3.grad_clip == 0.5


def test_yaml_roundtrip_and_overrides(tmp_path):
    cfg = load_config("configs/default.yaml")
    assert cfg.condition.temperature_anneal_steps == 5000
    cfg2 = apply_overrides(cfg, ["train.stage1.lr=3e-4", "condition.num_tokens=12"])
    assert cfg2.train.stage1.lr == 3e-4
    assert cfg2.condition.num_tokens == 12
    # untouched keys survive
    assert cfg2.condition.audio_norm_target == 60.0
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["condition.not_a_key=1"])


def test_mesh_and_sharding(eight_devices):
    mesh = make_mesh({"data": -1})
    assert mesh.devices.size == 8
    batch = {"x": jnp.ones((16, 4)), "y": jnp.zeros((16,))}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec("data", None)
    # 2-D mesh with a model axis
    mesh2 = make_mesh({"data": 4, "model": 2})
    assert mesh2.shape == {"data": 4, "model": 2}


def test_dtype_policy():
    from clap2diffusion_tpu.core.dtypes import DTypePolicy

    p = DTypePolicy.from_strings("float32", "bfloat16")
    assert p.param_dtype == jnp.float32 and p.compute_dtype == jnp.bfloat16
    assert p.cast(jnp.ones(2, jnp.float32)).dtype == jnp.bfloat16
    assert DTypePolicy.fp32().compute_dtype == jnp.float32


def test_key_stream():
    from clap2diffusion_tpu.core.prng import KeyStream, split_tree

    ks = KeyStream(0)
    a, b = ks(), ks()
    assert not jax.numpy.array_equal(jax.random.key_data(a), jax.random.key_data(b))
    keys = list(ks.take(3))
    assert len(keys) == 3
    tree = split_tree(jax.random.key(1), ["x", "y"])
    assert set(tree) == {"x", "y"}


def test_param_spec_tp_rule():
    from jax.sharding import PartitionSpec as P

    from clap2diffusion_tpu.parallel.sharding import param_spec

    wide = jnp.zeros((256, 24_576))   # adapter KV head -> model-sharded
    narrow = jnp.zeros((512, 768))
    bias = jnp.zeros((768,))
    assert param_spec((), wide) == P(None, "model")
    assert param_spec((), narrow) == P()
    assert param_spec((), bias) == P()
    odd = jnp.zeros((16, 4097))       # non-divisible width stays replicated
    assert param_spec((), odd) == P()


def test_timer_and_trace(tmp_path):
    from clap2diffusion_tpu.utils.profiling import Timer, trace_annotation

    t = Timer()
    with trace_annotation("unit"):
        out = t.time_fn("add", lambda: jnp.ones(8) + 1, warmup=1, iters=3)
    assert out.shape == (8,)
    s = t.summary()
    assert s["add"]["n"] == 3 and s["add"]["p50"] >= 0.0
