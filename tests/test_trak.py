"""JL projection + TRAK feature/score tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.attributions.methods.trak import (
    aggregate_by_group,
    compute_gradient_scores,
    feature_timesteps,
    make_grad_feature_fn,
)
from group_attribution_for_diffusion_models_tpu.config import SchedulerSpec, UNetSpec
from group_attribution_for_diffusion_models_tpu.diffusion import make_schedule
from group_attribution_for_diffusion_models_tpu.models import UNet2D
from group_attribution_for_diffusion_models_tpu.ops.jl_projection import (
    jl_project,
    jl_project_xla,
)


def test_jl_norm_preservation_and_determinism():
    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.normal(size=(8, 10000)).astype(np.float32))
    y1 = np.asarray(jl_project(g, 2048, seed=1))
    y2 = np.asarray(jl_project(g, 2048, seed=1))
    y3 = np.asarray(jl_project(g, 2048, seed=2))
    np.testing.assert_array_equal(y1, y2)
    assert (y1 != y3).any()
    ratios = np.linalg.norm(y1, axis=1) / np.linalg.norm(np.asarray(g), axis=1)
    np.testing.assert_allclose(ratios, 1.0, atol=0.15)


def test_jl_distance_preservation():
    """Pairwise distances survive the projection (the JL lemma)."""
    rng = np.random.RandomState(1)
    g = jnp.asarray(rng.normal(size=(6, 5000)).astype(np.float32))
    y = np.asarray(jl_project_xla(g, 2048, seed=0))
    g_np = np.asarray(g)
    d_in = np.linalg.norm(g_np[:, None] - g_np[None, :], axis=-1)
    d_out = np.linalg.norm(y[:, None] - y[None, :], axis=-1)
    iu = np.triu_indices(6, 1)
    np.testing.assert_allclose(d_out[iu] / d_in[iu], 1.0, atol=0.15)


def test_jl_linear():
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.normal(size=(2, 3000)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 3000)).astype(np.float32))
    pa = np.asarray(jl_project(a, 512, seed=5))
    pb = np.asarray(jl_project(b, 512, seed=5))
    pab = np.asarray(jl_project(a + b, 512, seed=5))
    np.testing.assert_allclose(pab, pa + pb, atol=1e-3)


def test_feature_timesteps():
    np.testing.assert_array_equal(
        feature_timesteps(1000, 10, "uniform"), np.arange(0, 1000, 100)
    )
    np.testing.assert_array_equal(
        feature_timesteps(1000, 5, "cumulative"), np.arange(5)
    )


def test_grad_features_end_to_end():
    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    tiny = UNetSpec(
        sample_size=8,
        block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        layers_per_block=1,
        norm_num_groups=4,
    )
    model = UNet2D(tiny)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    feat_fn = make_grad_feature_fn(
        model.apply, schedule, spec, output_fn="loss", proj_dim=256, num_timesteps=2
    )
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 3), minval=-1, maxval=1)
    f1 = np.asarray(feat_fn(params, images, jax.random.PRNGKey(2)))
    f2 = np.asarray(feat_fn(params, images, jax.random.PRNGKey(2)))
    assert f1.shape == (4, 256)
    np.testing.assert_array_equal(f1, f2)
    assert np.isfinite(f1).all()
    assert np.abs(f1).sum() > 0
    # Distinct images -> distinct gradient features.
    assert not np.allclose(f1[0], f1[1])


def test_gradient_scores_methods():
    rng = np.random.RandomState(3)
    phi_t = rng.normal(size=(20, 16))
    phi_g = rng.normal(size=(5, 16))
    trak = compute_gradient_scores(phi_t, phi_g, "trak", lambda_reg=0.1)
    assert trak.shape == (20, 5)
    sim = compute_gradient_scores(phi_t, phi_g, "grad_sim")
    np.testing.assert_allclose(sim, phi_t @ phi_g.T)
    rel = compute_gradient_scores(phi_t, phi_g, "relative_if", lambda_reg=0.1)
    ren = compute_gradient_scores(phi_t, phi_g, "renormalized_if", lambda_reg=0.1)
    assert np.isfinite(rel).all() and np.isfinite(ren).all()
    with pytest.raises(ValueError):
        compute_gradient_scores(phi_t, phi_g, "bogus")


def test_aggregate_by_group():
    scores = np.array([[1.0], [2.0], [3.0], [4.0]])
    labels = [0, 0, 1, 1]
    np.testing.assert_allclose(aggregate_by_group(scores, labels, "sum"), [3.0, 7.0])
    np.testing.assert_allclose(aggregate_by_group(scores, labels, "mean"), [1.5, 3.5])
    np.testing.assert_allclose(aggregate_by_group(scores, labels, "max"), [2.0, 4.0])


def test_jl_pallas_multi_ptile_accumulation():
    """Regression: with proj_dim spanning several p-tiles the reduction axis
    must be the inner grid dim — the old (d-outer) grid silently doubled the
    accumulated output on TPU. On CPU this exercises the XLA fallback; on TPU
    the real kernel."""
    import jax
    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.ops.jl_projection import (
        jl_project,
    )

    g = jax.random.normal(jax.random.PRNGKey(0), (8, 65536), jnp.float32)
    out = jl_project(g, 4096, seed=0, tile_d=2048, tile_p=512)
    ratio = np.asarray(
        jnp.linalg.norm(out, axis=1) / jnp.linalg.norm(g, axis=1)
    )
    # JL preserves norms in expectation; the doubling bug gave ratio ~2.
    assert abs(ratio.mean() - 1.0) < 0.2, ratio


ATTN_TINY = UNetSpec(
    sample_size=8,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
)


def test_probe_sketch_matches_projected_gradient():
    """The probe path's per-sample 'gradient' must equal down^T @ grad_kernel
    for every attention projection — the input-side JL sketch computed
    WITHOUT materializing the full per-sample gradient."""
    from group_attribution_for_diffusion_models_tpu.diffusion.schedulers import (
        add_noise,
    )
    from group_attribution_for_diffusion_models_tpu.models.lora import (
        lora_collection,
        probe_sketch_init,
    )

    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    model = UNet2D(ATTN_TINY)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    probe = probe_sketch_init(params, k=4, key=jax.random.PRNGKey(7))
    assert probe, "attention projections should be discovered"

    image = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 3), minval=-1, maxval=1)
    noise = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 3))
    t = jnp.array(17, jnp.int32)

    def loss_with(variables):
        x_t = add_noise(schedule, image[None], noise[None], t[None])
        eps = variables_apply(variables, x_t)
        return jnp.mean((eps[0] - noise) ** 2)

    def variables_apply(variables, x_t):
        return model.apply(variables, x_t, t[None])

    # Probe attachment with up=0 leaves the forward untouched.
    plain = loss_with({"params": params})
    downs = {n: ab["down"] for n, ab in probe.items()}
    ups0 = {n: ab["up"] for n, ab in probe.items()}
    tree0 = {n: {"down": downs[n], "up": ups0[n]} for n in probe}
    probed = loss_with({"params": params, "lora": lora_collection(tree0)})
    np.testing.assert_allclose(float(plain), float(probed), rtol=1e-6)

    # Sketch grads from the probe path.
    def probe_loss(ups):
        tree = {n: {"down": downs[n], "up": ups[n]} for n in ups}
        return loss_with({"params": params, "lora": lora_collection(tree)})

    sketch = jax.grad(probe_loss)(ups0)

    # Explicit full gradient, then project each kernel with its down.
    full = jax.grad(lambda p: loss_with({"params": p}))(params)

    def get(tree, dotted):
        node = tree
        for part in dotted.split("/"):
            node = node[part]
        return node

    for name in probe:
        expected = downs[name].T @ get(full, name)["kernel"]
        np.testing.assert_allclose(
            np.asarray(sketch[name]), np.asarray(expected), rtol=2e-4, atol=1e-7
        )


def test_probe_sketch_features_end_to_end():
    from group_attribution_for_diffusion_models_tpu.models.lora import (
        probe_sketch_init,
    )

    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    model = UNet2D(ATTN_TINY)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    probe = probe_sketch_init(params, k=4, key=jax.random.PRNGKey(7))
    feat_fn = make_grad_feature_fn(
        model.apply, schedule, spec, output_fn="loss", proj_dim=64,
        num_timesteps=2, sketch_probe=probe,
    )
    images = jax.random.uniform(
        jax.random.PRNGKey(1), (3, 8, 8, 3), minval=-1, maxval=1
    )
    f1 = np.asarray(feat_fn(params, images, jax.random.PRNGKey(2)))
    f2 = np.asarray(feat_fn(params, images, jax.random.PRNGKey(2)))
    assert f1.shape == (3, 64)
    np.testing.assert_array_equal(f1, f2)
    assert np.isfinite(f1).all() and np.abs(f1).sum() > 0
    assert not np.allclose(f1[0], f1[1])


def test_probe_sketch_excludes_params_filter():
    from group_attribution_for_diffusion_models_tpu.models.lora import (
        probe_sketch_init,
    )

    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    model = UNet2D(ATTN_TINY)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    probe = probe_sketch_init(params, k=4)
    with pytest.raises(ValueError, match="exclusive"):
        make_grad_feature_fn(
            model.apply, schedule, spec, sketch_probe=probe,
            params_filter=lambda p: (p, lambda t: t),
        )


def test_probe_sketch_journey_features():
    from group_attribution_for_diffusion_models_tpu.models.lora import (
        probe_sketch_init,
    )
    from group_attribution_for_diffusion_models_tpu.attributions.methods.trak import (
        make_journey_feature_fn,
    )

    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    model = UNet2D(ATTN_TINY)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    probe = probe_sketch_init(params, k=4, key=jax.random.PRNGKey(7))
    fn = make_journey_feature_fn(
        model.apply, schedule, spec, proj_dim=32, sketch_probe=probe
    )
    traj = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8, 8, 3))
    ts = jnp.array([5, 1], jnp.int32)
    feats = np.asarray(fn(params, traj, ts, jax.random.PRNGKey(2)))
    assert feats.shape == (3, 32)
    assert np.isfinite(feats).all() and np.abs(feats).sum() > 0


def test_probe_sketch_score_fidelity():
    """grad-sim TRAK scores from probe sketches track scores from full
    projected gradients of the same attention-kernel family (both are JL
    sketches of the same vectors; measured r≈0.94 on this configuration)."""
    from group_attribution_for_diffusion_models_tpu.models.lora import (
        DEFAULT_TARGETS,
        probe_sketch_init,
    )

    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    model = UNet2D(ATTN_TINY)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]

    def attn_filter(p):
        def rebuild(tree, tr, path=()):
            out = {}
            for k, v in tree.items():
                name = "/".join(path + (k,))
                if k in DEFAULT_TARGETS and name in tr:
                    out[k] = dict(v, kernel=tr[name]["kernel"])
                elif isinstance(v, dict):
                    out[k] = rebuild(v, tr, path + (k,))
                else:
                    out[k] = v
            return out

        def collect(tree, path=()):
            out = {}
            for k, v in tree.items():
                if k in DEFAULT_TARGETS:
                    out["/".join(path + (k,))] = {"kernel": v["kernel"]}
                elif isinstance(v, dict):
                    out.update(collect(v, path + (k,)))
            return out

        flat = collect(p)
        return flat, lambda tr: rebuild(p, tr)

    f_full = make_grad_feature_fn(
        model.apply, schedule, spec, proj_dim=512, num_timesteps=3,
        params_filter=attn_filter,
    )
    probe = probe_sketch_init(params, k=16, key=jax.random.PRNGKey(7))
    f_probe = make_grad_feature_fn(
        model.apply, schedule, spec, proj_dim=512, num_timesteps=3,
        sketch_probe=probe,
    )
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (12, 8, 8, 3), minval=-1, maxval=1)
    gen = jax.random.uniform(jax.random.PRNGKey(9), (6, 8, 8, 3), minval=-1, maxval=1)
    s_full = compute_gradient_scores(
        np.asarray(f_full(params, imgs, jax.random.PRNGKey(2))),
        np.asarray(f_full(params, gen, jax.random.PRNGKey(3))),
        method="grad_sim",
    ).ravel()
    s_probe = compute_gradient_scores(
        np.asarray(f_probe(params, imgs, jax.random.PRNGKey(2))),
        np.asarray(f_probe(params, gen, jax.random.PRNGKey(3))),
        method="grad_sim",
    ).ravel()
    r = np.corrcoef(s_full, s_probe)[0, 1]
    assert r > 0.8, r
