"""The five BASELINE.json workload configurations as values (config.py)."""

from rovr_tpu import config as C


class TestBaselineConfigs:
    def test_all_five_construct(self):
        cfgs = [
            C.config_pretrain(), C.config_eval(), C.config_imitation(),
            C.config_rl(), C.config_rl_scaled(),
        ]
        assert all(c.data.frame_size == (256, 256) for c in cfgs)

    def test_config_rl_dimensions(self):
        c = C.config_rl(16)
        assert c.rl.vid_length == c.rl.time_steps == 16
        assert c.model.pn2_num_frames == 16
        # 16 frames fit the 5x5 canvas grid
        assert c.model.canvas_tiles_per_row ** 2 >= 16

    def test_resolved_flow_size_clamps_both_dims(self):
        """rl.resolved_flow_size clamps the RAFT spatio size to the SMALLER
        frame dimension at every entry point (ADVICE r4: the clamp lived
        only in pipeline.run and read only the height, so wide-but-short
        frames at rl.run-direct call sites could still hit the measured
        ~13-min 256px RAFT compile trap, RLConfig.spatio_flow_size)."""
        import dataclasses

        from rovr_tpu.train.rl import resolved_flow_size

        c = C.Config()
        assert resolved_flow_size(c) == 256  # 256 frames keep 256
        c160 = c.replace(data=dataclasses.replace(
            c.data, frame_size=(160, 160)))
        assert resolved_flow_size(c160) == 160
        # non-square: the short side bounds it, whichever side is short
        wide = c.replace(data=dataclasses.replace(
            c.data, frame_size=(96, 320)))
        tall = c.replace(data=dataclasses.replace(
            c.data, frame_size=(320, 96)))
        assert resolved_flow_size(wide) == 96
        assert resolved_flow_size(tall) == 96
        # an explicit smaller request is honored
        small = c.replace(rl=dataclasses.replace(c.rl, spatio_flow_size=128))
        assert resolved_flow_size(small) == 128

    def test_config_rl_scaled_long_horizon(self):
        c = C.config_rl_scaled(64, data_parallel=8)
        assert c.rl.context_policy == "attention"
        assert c.rl.batch_size == 8
        assert c.mesh.data_parallel == 8
        # canvas still has room for all 64 frames (for the canvas-policy
        # comparison path)
        tiles = (c.model.canvas_size // c.model.canvas_tile) ** 2
        assert tiles >= 64

    def test_configs_are_frozen_values(self):
        import dataclasses

        c = C.config_rl()
        try:
            c.rl.vid_length = 5  # type: ignore[misc]
            raised = False
        except dataclasses.FrozenInstanceError:
            raised = True
        assert raised
