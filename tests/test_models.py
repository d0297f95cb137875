"""Golden shape/semantics tests for the model zoo, matching the dimensions
documented in SURVEY.md §2 (the reference itself has no tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rovr_tpu.models import (
    ActionLSTM,
    LocalNetUNet,
    PolicyNet1,
    PolicyNet2,
    ResNet50,
    VideoProcessor,
)

# CPU tests: float32 avoids bf16 emulation slowness and keeps asserts tight.
DT = jnp.float32


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


class TestLocalNet:
    def test_forward_shape_and_range(self, rng):
        model = LocalNetUNet(dtype=DT)
        target = jnp.ones((2, 64, 64, 3)) * 0.5
        context = jnp.ones((2, 2, 64, 64, 3)) * 0.25
        params = model.init(rng, target, context)
        out = model.apply(params, target, context)
        assert out.shape == (2, 64, 64, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_full_resolution(self, rng):
        model = LocalNetUNet(dtype=DT)
        target = jnp.zeros((1, 256, 256, 3))
        context = jnp.zeros((1, 2, 256, 256, 3))
        out = jax.eval_shape(
            lambda t, c: model.apply(model.init(rng, t, c), t, c), target, context
        )
        assert out.shape == (1, 256, 256, 3)


class TestPolicyNet2:
    def test_act_shapes(self, rng):
        model = PolicyNet2(dtype=DT)
        canvas = jnp.ones((3, 160, 160, 1))
        feat = jnp.ones((3, 1024))
        target = jnp.array([0, 1, 2])
        params = model.init(rng, canvas, feat, target, rng)
        actions, logprob = model.apply(params, canvas, feat, target, rng)
        assert actions.shape == (3, 2)
        assert logprob.shape == (3,)
        assert np.all(np.asarray(actions) >= 0) and np.all(np.asarray(actions) < 20)

    def test_target_never_selected(self, rng):
        """Masked logit at the target index is zeroed, then standardized —
        after Gumbel noise the target should essentially never win top-2 when
        other logits are large (policy_net_2.py:110-124 semantics)."""
        model = PolicyNet2(dtype=DT)
        canvas = jax.random.normal(rng, (1, 160, 160, 1))
        feat = jax.random.normal(jax.random.PRNGKey(1), (1, 1024))
        target = jnp.array([5])
        params = model.init(rng, canvas, feat, target, rng)
        logits = model.apply(
            params, canvas, feat, target, method=PolicyNet2.masked_logits
        )
        assert logits.shape == (1, 20)

    def test_logprob_and_value(self, rng):
        actor = PolicyNet2(dtype=DT)
        critic = PolicyNet2(dtype=DT, is_critic=True)
        canvas = jnp.ones((4, 160, 160, 1))
        feat = jnp.ones((4, 1024))
        target = jnp.arange(4)
        aparams = actor.init(rng, canvas, feat, target, rng)
        action = jnp.tile(jnp.array([[1, 2]]), (4, 1))
        lp = actor.apply(
            aparams, canvas, feat, target, action, rng, method=PolicyNet2.logprob
        )
        assert lp.shape == (4,)
        cparams = critic.init(
            jax.random.PRNGKey(2), canvas, feat, target, rng,
            method=lambda m, c, f, t, r: m.value(c, f),
        )
        v = critic.apply(cparams, canvas, feat, method=PolicyNet2.value)
        assert v.shape == (4,)

    def test_canvas_s2d_parity(self, rng):
        """The space-to-depth stage-1 path (canvas_impl='s2d') must be the
        SAME function as the plain layout: identical params (checkpoint
        interop) and matching _video_conv outputs in f32."""
        plain = PolicyNet2(dtype=jnp.float32, canvas_impl="plain")
        s2d = PolicyNet2(dtype=jnp.float32, canvas_impl="s2d")
        canvas = jax.random.normal(rng, (3, 160, 160, 1))
        feat = jnp.zeros((3, 1024))
        target = jnp.array([0, 1, 2])
        params = plain.init(rng, canvas, feat, target, rng)
        assert jax.tree_util.tree_structure(
            s2d.init(rng, canvas, feat, target, rng)
        ) == jax.tree_util.tree_structure(params)
        a = plain.apply(params, canvas, method=PolicyNet2._video_conv)
        b = s2d.apply(params, canvas, method=PolicyNet2._video_conv)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    def test_video_conv_is_1024(self, rng):
        """SURVEY.md §2.4: 160x160x1 canvas -> 1024-d flatten."""
        model = PolicyNet2(dtype=DT)
        canvas = jnp.ones((2, 160, 160, 1))
        feat = jnp.ones((2, 1024))
        target = jnp.array([0, 1])
        params = model.init(rng, canvas, feat, target, rng)
        out = model.apply(params, canvas, method=PolicyNet2._video_conv)
        assert out.shape == (2, 1024)


class TestPolicyNet1:
    def test_act_logprob_value(self, rng):
        actor = PolicyNet1(dtype=DT)
        image = jnp.ones((2, 80, 80, 3))
        token = jnp.zeros((2, 80, 80, 3))
        params = actor.init(rng, image, token, rng)
        action, logprob = actor.apply(params, image, token, rng)
        assert action.shape == (2,) and logprob.shape == (2,)
        assert np.all(np.asarray(action) < 25)
        lp = actor.apply(
            params, image, token, action, rng, method=PolicyNet1.logprob
        )
        assert lp.shape == (2,)

    def test_canvas_sized_input(self, rng):
        """pn1 also accepts the 160x160x1 VideoProcessor canvas + token."""
        actor = PolicyNet1(dtype=DT)
        image = jnp.ones((1, 160, 160, 1))
        token = jnp.zeros((1, 160, 160, 1))
        params = actor.init(rng, image, token, rng)
        action, _ = actor.apply(params, image, token, rng)
        assert action.shape == (1,)

    @pytest.mark.slow
    def test_valid_frames_masking(self, rng):
        """With the reference's fixed 25-way head (policy_net_1.py:13) but a
        shorter clip, valid_frames restricts both sampling and logprob
        support to frames that exist — a trained π₁ must never select an
        empty canvas tile (clamped gathers downstream)."""
        actor = PolicyNet1(dtype=DT, valid_frames=5)
        image = jnp.ones((4, 80, 80, 3))
        token = jnp.zeros((4, 80, 80, 3))
        params = actor.init(rng, image, token, rng)
        actions = []
        for i in range(16):
            a, lp = actor.apply(params, image, token, jax.random.PRNGKey(i))
            actions.append(np.asarray(a))
            assert np.all(np.isfinite(np.asarray(lp)))
        actions = np.concatenate(actions)
        assert np.all(actions < 5), actions
        # invalid indices carry ~zero probability in the PPO logprob path
        bad = jnp.full((4,), 7, jnp.int32)
        lp_bad = actor.apply(
            params, image, token, bad, rng, method=PolicyNet1.logprob
        )
        assert np.all(np.asarray(lp_bad) < -1e6)

    def test_exact_logprob_consistent(self, rng):
        """exact_logprob (the ppo_policy1 training mode): act's behavior
        logprob equals logprob()'s recompute at identical params — the PPO
        ratio starts at exactly 1, unlike the reference's Gumbel-noised
        recompute (policy_net_1.py:107-114) whose ratio is noise."""
        actor = PolicyNet1(dtype=DT, exact_logprob=True, valid_frames=5)
        image = jax.random.normal(rng, (3, 80, 80, 3))
        token = jnp.zeros((3, 80, 80, 3))
        params = actor.init(rng, image, token, rng)
        action, lp_act = actor.apply(params, image, token, jax.random.PRNGKey(3))
        lp_re = actor.apply(
            params, image, token, action, jax.random.PRNGKey(99),
            method=PolicyNet1.logprob,
        )
        np.testing.assert_allclose(
            np.asarray(lp_act), np.asarray(lp_re), rtol=1e-5, atol=1e-6
        )
        assert np.all(np.asarray(action) < 5)

    def test_critic_value(self, rng):
        critic = PolicyNet1(dtype=DT, is_critic=True)
        image = jnp.ones((2, 80, 80, 3))
        token = jnp.zeros((2, 80, 80, 3))
        params = critic.init(
            rng, image, token, method=lambda m, i, t: m.value(i, t)
        )
        v = critic.apply(params, image, token, method=PolicyNet1.value)
        assert v.shape == (2,)


class TestResNet:
    @pytest.mark.slow
    def test_pooled_features(self, rng):
        model = ResNet50(dtype=DT)
        x = jnp.ones((2, 224, 224, 3))
        params = model.init(rng, x)
        out = model.apply(params, x)
        assert out.shape == (2, 2048)

    def test_torch_conversion_shapes(self, rng):
        """convert_torch_state_dict output matches the init pytree structure."""
        from rovr_tpu.models.resnet import convert_torch_state_dict, STAGE_SIZES

        # build a fake torchvision-style state dict with correct shapes
        sd = {}

        def add_bn(prefix, c):
            for k, v in (("weight", c), ("bias", c), ("running_mean", c), ("running_var", c)):
                sd[f"{prefix}.{k}"] = np.zeros(v, np.float32)

        sd["conv1.weight"] = np.zeros((64, 3, 7, 7), np.float32)
        add_bn("bn1", 64)
        cin, f = 64, 64
        for stage, blocks in enumerate(STAGE_SIZES):
            for b in range(blocks):
                t = f"layer{stage + 1}.{b}"
                sd[f"{t}.conv1.weight"] = np.zeros((f, cin, 1, 1), np.float32)
                add_bn(f"{t}.bn1", f)
                sd[f"{t}.conv2.weight"] = np.zeros((f, f, 3, 3), np.float32)
                add_bn(f"{t}.bn2", f)
                sd[f"{t}.conv3.weight"] = np.zeros((f * 4, f, 1, 1), np.float32)
                add_bn(f"{t}.bn3", f * 4)
                if b == 0:
                    sd[f"{t}.downsample.0.weight"] = np.zeros((f * 4, cin, 1, 1), np.float32)
                    add_bn(f"{t}.downsample.1", f * 4)
                cin = f * 4
            f *= 2

        converted = convert_torch_state_dict(sd)
        model = ResNet50(dtype=DT)
        ref = model.init(jax.random.PRNGKey(0), jnp.ones((1, 224, 224, 3)))["params"]
        ref_shapes = jax.tree.map(lambda x: x.shape, ref)
        conv_shapes = jax.tree.map(lambda x: x.shape, converted)
        assert ref_shapes == conv_shapes


class TestVideoProcessor:
    def test_canvas_and_feats(self, rng):
        vp = VideoProcessor(dtype=DT)
        frames = jnp.ones((1, 6, 224, 224, 3)) * 0.5
        params = vp.init(rng, frames)
        canvas, feats = vp.apply(params, frames)
        assert canvas.shape == (1, 160, 160, 1)
        assert feats.shape == (1, 6, 1024)
        # tiles beyond the 6 frames are zero: rows 2+ of the 5-per-row grid
        assert float(jnp.abs(canvas[0, 64:, :, 0]).max()) == 0.0

    def test_insert_overwrites_only_target_tile(self, rng):
        vp = VideoProcessor(dtype=DT)
        frames = jnp.ones((1, 6, 224, 224, 3)) * 0.5
        params = vp.init(rng, frames)
        canvas, _ = vp.apply(params, frames)
        new_frame = jnp.zeros((1, 64, 64, 3))
        canvas2, feats2 = vp.apply(
            params, jnp.array([3]), new_frame, canvas,
            method=VideoProcessor.insert_encoded_frame_batch,
        )
        assert canvas2.shape == canvas.shape and feats2.shape == (1, 1024)
        diff = jnp.abs(canvas2 - canvas)[0, :, :, 0]
        # only tile (row 0, col 3) i.e. [0:32, 96:128] may change
        changed = np.argwhere(np.asarray(diff) > 1e-6)
        if changed.size:
            assert changed[:, 0].max() < 32
            assert 96 <= changed[:, 1].min() and changed[:, 1].max() < 128

    def test_extract_patch(self, rng):
        vp = VideoProcessor(dtype=DT)
        frames = jnp.ones((1, 6, 224, 224, 3)) * 0.5
        params = vp.init(rng, frames)
        canvas, _ = vp.apply(params, frames)
        patches = vp.apply(
            params, jnp.array([[0, 2, 5]]), canvas, method=VideoProcessor.extract_patch
        )
        assert patches.shape == (1, 3, 32, 32)
        np.testing.assert_allclose(
            np.asarray(patches[0, 1]), np.asarray(canvas[0, 0:32, 64:96, 0])
        )


class TestActionLSTM:
    def test_carry_and_token(self, rng):
        lstm = ActionLSTM()
        actions = jnp.array([[3, 1, 2]])
        patches = jnp.ones((1, 3, 32, 32))
        carry = lstm.init_carry(1)
        params = lstm.init(rng, carry, actions, patches)
        (hx, cx), token = lstm.apply(params, carry, actions, patches)
        assert token.shape == (1, 160, 160, 1)
        assert hx.shape == (1, 1024)
        # stateful across steps: second call with new carry differs
        (_, _), token2 = lstm.apply(params, (hx, cx), actions, patches)
        assert not np.allclose(np.asarray(token), np.asarray(token2))


class TestStandardize:
    def test_constant_column_gradient_finite(self):
        """Regression: d/dx sqrt(var) is infinite at var=0, so a constant
        column across the PPO batch (a ReLU-dead feature in
        PolicyNet2.value's axis-0 standardization) produced 0*inf = NaN
        gradients that NaN'd the critic one Adam step later. standardize
        must give exactly-zero (finite) gradients for constant columns."""
        from rovr_tpu.models.layers import standardize

        x = jnp.concatenate(
            [jnp.zeros((8, 3)), jax.random.normal(jax.random.PRNGKey(0), (8, 3))],
            axis=1,
        )

        def loss(x):
            return jnp.sum(standardize(x, axis=0, eps=0.001) ** 2)

        g = jax.grad(loss)(x)
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_array_equal(np.asarray(g[:, :3]), 0.0)
