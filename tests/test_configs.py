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
