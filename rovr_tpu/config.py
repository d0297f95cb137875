"""Single config tree for every ROVR-TPU workload.

The reference scatters hyperparameters across hardcoded constants
(lrs at rovr.py:58-60, clip at rovr.py:51, Gumbel temperatures at
policy_net_1.py:17 / policy_net_2.py:22, mask geometry at video_ds.py:62-77,
dataset paths at test.py:60) plus three argparse flags (test.py:12-16) and one
env var (video_ds_explicit.py:34). Here every knob lives in one frozen
dataclass tree so each of the five BASELINE.json configs is a pure value.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input pipeline. Mirrors video_ds.py / video_ds_explicit.py semantics."""

    root_folder: str = "out/LQ"
    # Reference loads 50 frames/clip, takes every 2nd -> 25 (video_ds.py:106),
    # or the first 20 shuffled for the explicit dataset (video_ds_explicit.py:90).
    frames_per_clip: int = 50
    vid_length: int = 20
    frame_size: Tuple[int, int] = (256, 256)  # H, W after half-split resize
    # Corruption (video_ds.py:18-89)
    difficulty: int = 2
    brightness: int = 40
    noise: int = 20
    # Reference computes a random jitter box then discards it
    # (video_ds.py:32-59: `mask` re-initialized at :59). Default preserves that
    # behavior for parity; set True to apply the evidently intended extra box.
    apply_jitter_box: bool = False
    # Debug affordance (video_ds_explicit.py:33-34)
    debug_short_dataset: bool = False
    # Host-side pipeline
    num_workers: int = 8
    prefetch_depth: int = 2
    use_native_loader: bool = True  # C++ decode/corrupt path when available
    # Stage clips to the device as uint8 [0,255] instead of float32 [0,1]:
    # 4x less H2D traffic per step; the /255 normalization runs on device
    # inside the jitted train step (rl._train_step), numerically identical.
    # Measured in benchmarks/sustained_bench.py. Default False keeps the
    # reference's float tensors (video_ds.py:135) at the API boundary.
    stage_uint8: bool = False
    # Synthetic explicit masks: cell-aligned overlap-free boxes instead of
    # the reference's 100x50 jittered boxes (which overlap across DIFFERENT
    # raster locations, making teacher-pair exposure only ~85% pixel-true
    # and compressing the context-selection signal — measured in
    # benchmarks/context_sensitivity.py). False = reference geometry parity.
    synthetic_overlap_free: bool = False
    # Which corruption scheme the synthetic RL/eval sources use:
    #   "explicit" — the teacher group-mask scheme (video_ds_explicit.py).
    #                Adversarial to marginal top-2 policies BY CONSTRUCTION:
    #                full exposure needs JOINT pair coverage; the ceiling for
    #                any factorized policy (the reference's class) is 0.75
    #                exposure vs 0.67 random (benchmarks/policy_ceiling.py).
    #   "raster"   — the standard deterministic raster box tracking frame
    #                index (video_ds.py:62-87, the poster's RealVSR task
    #                geometry). Sequential contexts expose 0.47; any far
    #                frame exposes 1.0 — a per-frame criterion a marginal
    #                policy CAN learn. The agentic-vs-sequential demo scheme.
    # Imitation follows this too: under "raster" it derives analytic teacher
    # tables from the box geometry (device_synthetic.raster_positive_pairs /
    # raster_negative_pairs), the same paradigm as the explicit dataset's
    # solution tables.
    synthetic_scheme: str = "explicit"


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model-zoo dimensions (SURVEY.md §2.2-2.6)."""

    # Local inpainting UNet (local_net.py:12-39): enc 9->64->128->256->512.
    local_net_channels: Tuple[int, ...] = (64, 128, 256, 512)
    # Policy 1 frame-selection UNet (policy_net_1.py:20-57).
    pn1_channels: Tuple[int, ...] = (32, 64, 128, 256)
    pn1_num_frames: int = 25
    pn1_temperature: float = 0.5
    # Policy 2 context-selection net (policy_net_2.py:41-69).
    pn2_num_frames: int = 20
    pn2_temperature: float = 0.7
    pn2_fc_dims: Tuple[int, ...] = (1024, 512, 256, 64)
    # Deterministic-serving norm mode: True computes the policy trunks'
    # batch-stat norms per SAMPLE (instance-norm-style, same params), so a
    # clip's context selection — and therefore its reconstruction — is
    # identical whether served alone or in a batch of 8. False (default) is
    # the reference's train-mode-forever BatchNorm, whose outputs depend on
    # the serving batch's composition (documented deviation,
    # docs/migration.md; layers.BatchStatNorm).
    per_sample_stats: bool = False
    # VideoProcessor state canvas: re-specified from call-site constraints
    # (SURVEY.md §2.13): single-channel 160x160 canvas of 32x32 tiles, 5 per
    # row (room for 25 frames), plus a 1024-d per-frame feature vector.
    canvas_size: int = 160
    canvas_tile: int = 32
    canvas_tiles_per_row: int = 5
    feature_dim: int = 1024
    # ActionLSTM (action_lstm.py:13-17)
    lstm_hidden_dim: int = 1024
    # Attention context policy (models/policy_attention.py) — the revived
    # ViT policy for long clips (BASELINE.json config 5); used when
    # rl.context_policy == "attention".
    attn_hidden_dim: int = 256
    attn_heads: int = 4
    attn_depth: int = 2
    attn_patch_tokens: int = 4
    # Inner attention dispatch: "auto" (Pallas flash kernel on TPU inside its
    # envelope, jnp elsewhere), "pallas" (force the kernel), "jnp", or "ring"
    # (sequence-parallel over the mesh's model axis; pass the mesh to
    # rl.make_modules).
    attn_impl: str = "auto"
    # > 0: pipeline-parallel encoder stack (parallel/pp.py) — attn_depth
    # blocks split into mesh.shape[model] stages, this many microbatches
    # streamed per step. 0 = sequential (single-chip) application.
    attn_pp_microbatches: int = 0
    # > 0: replace each encoder block's dense FFN with this many
    # switch-routed experts (models/moe.py); experts shard over the mesh's
    # model axis when make_modules gets a mesh — the expert-parallel (EP)
    # option. 0 = dense FFN (reference FFN shape, common_layers.py:80-92).
    attn_moe_experts: int = 0
    attn_moe_capacity: float = 1.25
    # Compute dtype for conv/matmul-heavy paths. Params stay float32.
    compute_dtype: str = "bfloat16"
    # Feature-extractor trunk: "resnet50" (reference parity) or "tiny"
    # (small trunk; exists so the test suite's tiny configs compile fast).
    backbone: str = "resnet50"
    # 1 = reference's global average pool (resnet_extractor.py:13); g > 1
    # pools the backbone's final map to a (g, g) grid instead — required for
    # the teacher task to be learnable from RANDOM (no-egress) backbone
    # weights, where globally pooled features lose mask positions
    # (models/resnet.ResNet50 docstring).
    backbone_spatial_pool: int = 1
    # LPIPS VGG stage plan ((features, n_convs) per stage); None = real
    # VGG16. Tests shrink it — same tap/normalize/lin math, tiny compile.
    lpips_stages: Optional[Tuple[Tuple[int, int], ...]] = None
    # RL-rollout LPIPS tap cache split (train/rl.py): org-frame VGG taps of
    # stages >= this index are cached for the episode; earlier stages are
    # recomputed per step for the gathered target frames (bit-identical — a
    # prefix of the same trunk). Stage 0 is ~52% of the cache bytes
    # (256^2x64 bf16 = 8.4 MB/frame) but only ~5.4 GFLOP/frame to recompute.
    # 0 = cache every stage (fastest when it fits; measured best through
    # batch 16 on 16 GB HBM). 1 + lpips_init_chunk unlocks batch >= 24:
    # 13.8 -> 9.0 GB step footprint for ~1% throughput (docs/performance.md).
    lpips_cache_from_stage: int = 0
    # > 0: the episode-init LPIPS baseline (taps of ALL B*S corrupted+org
    # frames) runs as a lax.map over S in chunks of this many frames,
    # bounding the init's transient taps to ~2*chunk*B frames instead of
    # 2*S*B. Requires vid_length % chunk == 0 (falls back to one pass
    # otherwise). Pair with lpips_cache_from_stage=1 for batch >= 24.
    lpips_init_chunk: int = 0


@dataclasses.dataclass(frozen=True)
class RLConfig:
    """PPO / rollout hyperparameters (rovr.py:26-60)."""

    vid_length: int = 20
    time_steps: int = 20
    n_updates_per_ppo: int = 5
    # Clips per train step. The reference is pinned to 1 (test.py:18); batching
    # clips is the first TPU win (MXU utilization) and the unit of data
    # parallelism for config 5.
    batch_size: int = 1
    # Revive the frame-selection policy π₁ + ActionLSTM history path (disabled
    # in the reference's shipped main path, rovr.py:118-128: target = j).
    use_policy1: bool = False
    # Also TRAIN π₁/V₁ with PPO from the shared reward stream. The reference
    # declares this in its MDP (poster) but ships it unreachable — ppo(1, ...)
    # raises (rovr.py:282-283) and the pn1 update call is commented out
    # (rovr.py:75-76). Beyond-parity feature: with free frame selection the
    # learnable signal is COVERAGE (re-reconstructing a frame earns ~zero
    # marginal LPIPS improvement after curr_loss updates, rovr.py:202-205),
    # read out by the Episode/coverage metric. Requires use_policy1.
    ppo_policy1: bool = False
    # Context-selection policy implementation: "canvas" = PolicyNet2 over the
    # state canvas (the reference's main path), "attention" = the revived
    # transformer policy over per-frame feature tokens (config 5 long clips).
    context_policy: str = "canvas"
    clip: float = 0.2
    gamma: float = 1.0
    actor_lr: float = 2e-4
    critic_lr: float = 2e-4
    # (The reference also declares lpips_mse_gamma=1 and a local_net
    # optimizer at lr 2e-4, rovr.py:51,60 — but every line that would read
    # them is commented out (the local-net finetune backward/step,
    # rovr.py:258-259, and no loss expression even exists). Those constants
    # are NOT mirrored here: a config field nothing reads is a correctness
    # trap. The live γ-anneal pretrain loss has its own PretrainConfig.)
    #
    # Optical-flow "spatio" signal (rovr.py:234-243): the reference computes
    # it with RAFT every episode, LOGS it ('Local_Net/spatio_loss'), and
    # ships its reward addition commented out (`rewards[-1] -= spatio`,
    # rovr.py:238).
    #   log_spatio=True       — compute + log Episode/spatio each train step
    #                           (the reference's shipped behavior). Costs
    #                           three RAFT sweeps over B·(S-1) frame pairs
    #                           per step, so the hot train step defaults it
    #                           off (documented deviation; eval always
    #                           reports flow recovery, train/evaluate.py).
    #   use_spatio_reward=True — also ADD spatio_scale·recovery to the final
    #                           step's reward before rewards-to-go (implies
    #                           log_spatio). Sign: the reference's commented
    #                           line SUBTRACTS the bonus, which would punish
    #                           good flow recovery; the poster's stated
    #                           intent ("increase distance from corrupted
    #                           optical flow and decrease distance from
    #                           original", rovr.py:239 comment) is the
    #                           addition implemented here (docs/migration.md).
    use_spatio_reward: bool = False
    log_spatio: bool = False
    spatio_scale: float = 7.5
    # RAFT input resize for the spatio computation (the reference resizes
    # frames to 256x256, rovr.py:346). Measured on-chip (r4): at 256 the
    # 12-iter RAFT over a (4,20) batch costs 420 ms/call and — the real
    # trap — ~13 MIN of XLA compile; at 160 it is 140 ms and 13 s, at 128
    # 61 ms. rl.resolved_flow_size therefore clamps this to the smaller
    # frame dimension at every entry point (upsampling past native size
    # adds no flow information); 256 is only effective when frames are 256.
    spatio_flow_size: int = 256
    # Condition the inpainting UNet on the EVOLVING reconstruction (gather
    # target/context frames from `recon`) instead of the immutable corrupted
    # video. The reference gathers cache_target_frame and both context frames
    # from the original corrupted `video` (rovr.py:133,152-153), so parity is
    # False; True is a documented deviation (docs/migration.md) that lets
    # later steps build on earlier reconstructions.
    recon_context: bool = False
    # Run the sequential (vid2vid-style) no-grad baseline reconstruction
    # alongside the rollout (rovr.py:164-175). Observational only — never
    # feeds back into rewards — and a second UNet pass per step, so the
    # train path leaves it off; evaluation (train/evaluate.py) turns it on
    # for the poster's agentic-vs-sequential comparison.
    sequential_baseline: bool = False
    # Deterministic (no-Gumbel) top-2 context selection in the rollout.
    # Training always samples (parity: rovr.py:141); evaluation flips this
    # on via eval_greedy — the standard deterministic policy readout.
    greedy: bool = False
    eval_greedy: bool = True
    # Fully unroll the rollout/PPO scans (and run the chunked episode init
    # as a Python loop). FLOP-counting affordance for bench.py's mfu_hand:
    # XLA's cost model counts a lax.scan body ONCE regardless of trip count
    # (docs/performance.md "MFU as a FLOOR"), so an unrolled lowering is the
    # only graph whose cost analysis equals the executed flops. Not for
    # training runs: the unrolled graph compiles far slower and XLA
    # schedules the rolled scan just as well.
    unroll_scans: bool = False
    # Partial unroll factor for the rollout/PPO lax.scans (lax.scan's
    # `unroll=`): >1 replicates the body that many times per loop iteration,
    # trading compile time for less loop overhead and cross-iteration
    # fusion opportunities. Measured on the v5e at the bench point
    # (docs/performance.md): within noise of 1 — the scan bodies are big
    # compute-bound graphs, so loop overhead is already negligible. Kept as
    # a knob because the tradeoff is shape-dependent (tiny-body scans on
    # other configs may differ). Need not divide time_steps /
    # n_updates_per_ppo — lax.scan peels the remainder iterations
    # (verified). Ignored when unroll_scans fully unrolls.
    scan_unroll: int = 1


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    """Local-net supervised pretrain (train_local_net_unet.py)."""

    batch_size: int = 24
    lr: float = 1e-4
    # gamma = 0.1 + 0.9 * 0.9993**step (train_local_net_unet.py:109)
    gamma_floor: float = 0.1
    gamma_scale: float = 0.9
    gamma_decay: float = 0.9993
    # Reference supervises against frame f-1, not f
    # (train_local_net_unet.py:44-52). Off by default: we fix the off-by-one
    # and document the deviation; set True to reproduce it bit-for-bit.
    legacy_target_offset: bool = False
    viz_every: int = 200
    checkpoint_every: int = 2000
    steps: int = 10_000


@dataclasses.dataclass(frozen=True)
class ImitationConfig:
    """Policy-2 warm start (imitation_learning.py)."""

    lr: float = 2e-4
    positive_weight: float = 1.5   # imitation_learning.py:91
    negative_weight: float = 1.0   # imitation_learning.py:94
    checkpoint_every: int = 250
    steps: int = 1000
    # Also train the VideoProcessor's projection heads (NOT the backbone —
    # it stays frozen either way). The reference trains only pn2
    # (imitation_learning.py:98-100) because its backbone is pretrained;
    # with random no-egress weights the fixed random projections are the
    # bottleneck, so the heads learn here too. False = strict parity.
    train_vp: bool = True
    # Imitation objective:
    #   "bce"     — reference parity (imitation_learning.py:88-94): multi-hot
    #               BCE averaged over ALL positive pairs (+w) and negative
    #               pairs (-w). Measured pathology: averaging over 16 pairs
    #               only teaches per-frame marginal frequency; its own
    #               OPTIMUM's greedy top-2 exposes just 0.65 of the hole —
    #               below random pairs (0.76) — because two individually
    #               frequent frames usually cover the same regions.
    #   "pair_ce" — softmax cross-entropy toward ONE canonical teacher pair
    #               (positives[:, 0]): the optimum puts the top-2 exactly on
    #               that pair (measured: exposure 1.00, pair-acc 1.00).
    #               Documented deviation (docs/migration.md).
    loss_mode: str = "bce"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh / sharding (SURVEY.md §2.14 rebuild column)."""

    # Axis names: data (clips), model (reserved for tensor-parallel convs).
    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = 1
    model_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Checkpoint/metrics plumbing (SURVEY.md §5)."""

    run_dir: str = "runs"
    experiment: str = "rovr"
    restore_from: Optional[str] = None  # replaces hardcoded paths rovr.py:38,41
    checkpoint_every: int = 1
    log_every: int = 1
    seed: int = 0
    max_iterations: int = 400  # test.py:75-76 hard stop


@dataclasses.dataclass(frozen=True)
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    rl: RLConfig = dataclasses.field(default_factory=RLConfig)
    pretrain: PretrainConfig = dataclasses.field(default_factory=PretrainConfig)
    imitation: ImitationConfig = dataclasses.field(default_factory=ImitationConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    run: RunConfig = dataclasses.field(default_factory=RunConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# The five BASELINE.json configs as values.

def config_pretrain() -> Config:
    """1: local_net UNet supervised inpainting on masked clips."""
    return Config()


def config_eval() -> Config:
    """2: extractor + local_net reconstruction eval (no RL)."""
    return Config()


def config_imitation() -> Config:
    """3: imitation warm-start of the context policy."""
    return Config()


def config_rl(vid_length: int = 16) -> Config:
    """4: full RL loop over 16-frame clips."""
    c = Config()
    return c.replace(
        rl=dataclasses.replace(c.rl, vid_length=vid_length, time_steps=vid_length),
        data=dataclasses.replace(c.data, vid_length=vid_length),
        model=dataclasses.replace(
            c.model, pn2_num_frames=vid_length, pn1_num_frames=vid_length
        ),
    )


def config_rl_scaled(vid_length: int = 64, data_parallel: int = 8) -> Config:
    """5: long-horizon batched rollouts on a v5e-8 mesh — clip batch sharded
    on `data`, the attention context policy over frame-patch tokens."""
    c = config_rl(vid_length)
    tiles_per_row = 8  # room for 64 frames on the canvas
    return c.replace(
        mesh=dataclasses.replace(c.mesh, data_parallel=data_parallel),
        rl=dataclasses.replace(
            c.rl, context_policy="attention", batch_size=data_parallel
        ),
        model=dataclasses.replace(
            c.model,
            canvas_tiles_per_row=tiles_per_row,
            canvas_size=tiles_per_row * c.model.canvas_tile,
        ),
    )
