"""Configuration system: typed dataclasses + CLI parser.

Replaces the reference's flat argparse namespace (src/utils/parser.py:4-195,
consumed as a module global at src/run-nerf.py:40) with structured dataclasses
that are explicitly threaded through the framework. Flag names mirror the
reference's where sensible so command lines port over directly.

Reference quirks intentionally fixed (SURVEY.md appendix):
  * `--skip` had `type=list` (broken for user input) -> comma-separated ints.
  * `--model` advertised unimplemented 'ensemble'/'sires' -> only real models.
  * `--log_space` store_false confusion -> explicit --linear_freqs to disable.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import yaml


@dataclass(frozen=True)
class EncoderConfig:
    """Positional-encoding options (reference: parser.py:12-34)."""

    d_input: int = 3
    n_freqs: int = 10
    n_freqs_views: int = 4
    log_space: bool = True          # reference default: log-spaced frequencies
    no_dirs: bool = False
    # FreeNeRF-style annealed frequency masking: number of steps over which the
    # visible frequency band linearly grows. 0 disables (identity mask).
    freq_reg_end: int = 0


@dataclass(frozen=True)
class ModelConfig:
    """Model options (reference: parser.py:36-53)."""

    model: str = "nerf"             # nerf | sinerf
    d_filter: int = 256
    n_layers: int = 8
    skip: Tuple[int, ...] = (4,)
    # Density activation applied to the raw sigma head. The reference NeRF
    # emits raw (unactivated) sigma (models.py:105,127); SiNeRF applies ReLU
    # (models.py:273-277). 'none' reproduces reference NeRF.
    density_activation: str = "none"  # none | relu | trunc_exp
    # Use the fused Pallas MLP kernels for training (custom-VJP,
    # ops/pallas/mlp_train.py) and inference (ops/pallas/mlp.py).
    # None = auto: ON when running on an accelerator backend with a plain
    # NeRF (raw sigma head) — measured ~10% faster training on v5e at equal
    # quality (3-seed study + A/B, BASELINE.md) — OFF on the CPU backend
    # where Mosaic kernels cannot compile. --no_fused_kernel forces off.
    fused_kernel: Optional[bool] = None
    # Fused-train-kernel backward mode: save the trunk activation chain to
    # HBM in the forward and skip the trunk recompute in the backward
    # (ops/pallas/mlp_train.py). Gradients are bitwise identical either
    # way; default ON — measured +7.9% train throughput on v5e (298k ->
    # 321k rays/s, BASELINE.md r3). --no_fused_save_acts restores the
    # zero-HBM recompute backward.
    fused_save_acts: bool = True
    # Compute the positional encoding INSIDE the fused train kernels
    # (periodic-4 lane layout + _sincos_fast, ops/pallas/mlp_train.py::
    # _encode_block) instead of XLA-side encode/cast/pad: removes the
    # row-proportional glue that was the entire hierarchical "kernel MFU
    # gap" (benchmarks/sol_hier_kernel.py) and shrinks kernel inputs from
    # 192 to 128 B/row. Identical math up to the <= 9e-5 sincos polynomial
    # error (below the features' bf16 rounding). --no_fused_encode reverts
    # to precomputed-encoding operands.
    fused_encode: bool = True
    # Row-block size of the fused train kernels (None = auto per backward
    # mode, ops/pallas/mlp_train.py). Programmatic tuning knob (no CLI
    # flag); measured on v5e in benchmarks/ab_block_rows.py /
    # ab_save_acts.py.
    fused_block_rows: Optional[int] = None
    # Forward-kernel row-block size (None = fused_block_rows). The forward
    # has no resident grad accumulators, so it tolerates far larger blocks
    # than the backward; larger forward blocks amortize per-grid-step
    # overhead (the r4 sol decomposition pinned the forward as scheduling-
    # bound at 0.67-0.80 ms vs its 0.428 ms GEMM ideal). Measured on v5e in
    # benchmarks/ab_pipeline.py. Programmatic tuning knob (no CLI flag).
    fused_fwd_block_rows: Optional[int] = None
    # Mosaic scoped-VMEM cap for the fused train kernels in MB (None = 32).
    # v5e physically has 128 MB VMEM/core; blocks > 1024 rows need more
    # than the 32 MB default.
    fused_vmem_limit_mb: Optional[int] = None
    # Saved-acts stream stride: save every stride-th trunk activation
    # (plus the last) and regenerate the gaps in the backward, one GEMM per
    # gap layer (ops/pallas/mlp_train.py::_reconstruct_h). Gradients bitwise
    # identical across strides. MEASURED DEAD END on v5e (ab_acts_stride.py):
    # the gap reconstruction's f32 intermediates make block 1024 VMEM-
    # infeasible, and at the forced smaller blocks every stride>1 arm loses
    # 8-12% e2e (both strategies) — the acts stream it saves was already
    # overlapped. None = 1 (save all); knob kept for other TPU generations.
    fused_acts_stride: Optional[int] = None
    # Fused-train-kernel sub-chain interleave: split each row block into
    # this many independent chains, emitted layer-wise interleaved, so
    # Mosaic can overlap one chain's VPU tail with another's MXU GEMM
    # (ops/pallas/mlp_train.py). Measured NEUTRAL on v5e (+-1.4%,
    # benchmarks/ab_interleave.py — Mosaic already overlaps within one
    # chain); None = 1 (single chain). Tuning knob for other TPU
    # generations (no CLI flag).
    fused_interleave: Optional[int] = None
    # SiNeRF fused-kernel backward mode (ops/pallas/siren.py): the forward
    # streams the trunk activations AND premultiplied sine derivatives
    # (bf16) to HBM; the backward skips the whole trunk recompute — GEMMs
    # and the sin/cos transcendentals (multi-op VPU sequences) — and the
    # row block rises 256 -> 512 (the recompute's f32 y-list is what caps
    # it). Unlike the NeRF kernel, gradients are NOT bitwise identical
    # across modes: the saved cos factor is bf16-rounded (tolerance-tested;
    # quality A/B'd on v5e). Programmatic knob (no CLI flag).
    siren_save_acts: bool = True
    # Use the fused ray-march render kernel (ops/pallas/render.py: MLP +
    # compositing + exact early exit in one kernel) for eval/video rendering.
    # Applies to NeRF model + occgrid strategy + single-chip (silently falls
    # back to the XLA pipeline otherwise). Measured ~10% faster than the XLA
    # render path on v5e and equivalence-tested; disable with
    # --no_fused_render.
    fused_render: bool = True


@dataclass(frozen=True)
class DataConfig:
    """Dataset options (reference: parser.py:55-91)."""

    dataset: str = "synthetic"      # synthetic | llff | sphere | lattice (procedural test scenes)
    scene: str = "lego"
    n_imgs: int = 100
    white_bkgd: bool = False
    # LLFF image downsample factor. NOTE: the reference's --factor default is
    # 4 but its loader hard-codes images_8/ + focal/8 (splitter.py:199-218);
    # default 8 matches the actual reference ingest.
    factor: int = 8
    bd_factor: float = 0.75
    no_recenter: bool = False
    data_root: str = "../datasets"
    val_ratio: float = 0.15
    test_ratio: float = 0.15
    # Downsample factor applied to synthetic images (1 = full res).
    downsample: int = 1


@dataclass(frozen=True)
class SamplingConfig:
    """Ray sampling + occupancy grid (reference: run-nerf.py:92-98,287-295).

    Two strategies, both dense/static-shape (TPU-first redesign of nerfacc's
    ragged packed sampling, SURVEY.md section 7):
      * 'occgrid': n_samples uniform(-stratified) samples inside the ray/AABB
        intersection, masked by a binarized multi-level occupancy grid.
      * 'hierarchical': classic NeRF coarse stratified + inverse-CDF fine.
    """

    strategy: str = "occgrid"       # occgrid | hierarchical
    n_samples: int = 512            # samples/ray (occgrid) or coarse count
    n_fine: int = 128               # fine samples (hierarchical only)
    # occgrid only: compact each ray's valid samples to this many before the
    # MLP runs (0 = evaluate the full dense lattice). The dense analogue of
    # nerfacc pruning; the main MLP-FLOP lever once the grid converges.
    n_compact: int = 192
    # Adaptive compaction: shrink the compaction K at runtime as the
    # occupancy grid converges and the measured MEAN per-ray valid-sample
    # count falls — the train loop swaps in a recompiled step when the ladder
    # value changes (train/loop.py::CompactionController). n_compact is the
    # CEILING. Rays above K get an unbiased coarser quadrature
    # (compact_samples spread), measured quality-neutral.
    adapt_compact: bool = True
    # Ladder safety margin: K targets ceil(margin * mean_valid / 16) * 16.
    # 1.0 measured quality-equal to 1.25 across seeds (margin effects
    # ~0.1 dB vs ~1.7 dB seed noise, 3k-step held-out A/B) and ~16% faster
    # at steady state; the ceil-to-16 already provides +8 average headroom.
    compact_margin: float = 1.0
    # transmittance early termination using the grid's EMA density values
    # (nerfacc early_stop_eps semantics); 0 disables.
    early_stop_eps: float = 1e-4
    # occupancy-query decimation: one grid lookup per group of this many
    # samples. 0 = auto (largest lossless stride for the scene's cell size
    # and the chosen dilation, ops/occgrid.py::resolve_query_plan).
    query_stride: int = 0
    # Chebyshev dilation radius of the occupancy QUERY tables. Radius r
    # doubles the lossless query stride per unit (the gather cost is linear
    # in query count — the dominant non-MLP step cost), at the price of a
    # conservative r-cell false-positive shell around occupied regions.
    # None = auto (radius 1 when it buys a larger stride, else 0).
    query_dilation: Optional[int] = None
    # Cap for the auto query stride (0 = default 8). Explicit query_stride
    # ignores this.
    query_max_stride: int = 0
    render_step_size: float = 5e-3  # reference fixed march step
    grid_resolution: int = 128
    grid_levels: int = 1            # 1 for synthetic, 4 for llff (run-nerf.py:92-93)
    occ_thre: float = 1e-2
    ema_decay: float = 0.95
    update_interval: int = 16
    # Late-phase refresh interval: once the grid has converged (EMA settled,
    # step >= update_interval_late_start) the per-cell refresh loop can run
    # 4x rarer at unchanged quality (full-scale A/B, BASELINE.md r3) —
    # the refresh density pass is ~13% of steady-state step time at
    # interval 16. Set update_interval_late=0 (or == update_interval) to
    # keep nerfacc's fixed 16-step cadence for the whole run.
    update_interval_late: int = 64
    update_interval_late_start: int = 1024
    warmup_steps: int = 256
    # Culling hold: keep every cell occupied (threshold -1; EMA still
    # accumulates) until this step. -1 = auto: the encoder's freq_reg_end
    # when FreeNeRF annealing is on, else 0. Rationale: the refresh
    # evaluates the MASKED model, so with annealed frequency masking the
    # grid culls thin structure the low-band-only model cannot yet form
    # and those cells never receive samples again (measured -8.4 dB at
    # n=8 on the lattice scene; BASELINE.md r5). 0 disables.
    grid_hold_steps: int = -1
    # Fraction of grid cells refreshed per update after warmup (round-robin,
    # static shapes; nerfacc samples 1/4 of cells per update).
    update_parts: int = 4
    perturb: bool = True            # stratified jitter during training


@dataclass(frozen=True)
class TrainConfig:
    """Training options (reference: parser.py:93-172)."""

    n_iters: int = 8000             # 20**3 default (parser.py:96-98)
    batch_size: int = 1024
    lro: float = 5e-4
    decay_rate: float = 0.1
    Td: int = 250000
    scheduler: str = "exp"          # const | exp
    seed: int = 42
    # frequency/weight regularization (run-nerf.py:266-279)
    ao: Optional[float] = None
    reg_ratio: float = 0.5
    reg: str = "l1"                 # l1 | l2
    # occlusion regularization (src/core/loss.py)
    occ_a: Optional[float] = None
    occ_b: Optional[float] = None
    occ_func: str = "linear"        # linear | exp
    beta: Optional[float] = None    # gates occlusion reg (reference: gates only)
    # numerics: bfloat16 activations are the TPU-native default — 2.6x faster
    # than float32(HIGHEST) with equal converged quality (3k-step A/B:
    # bf16 29.05 vs f32 28.94 val PSNR); float32 available for strict parity
    dtype: str = "bfloat16"         # compute dtype for MLP matmuls: float32|bfloat16
    # validation cadence
    val: bool = False
    val_rate: int = 500
    # checkpointing (new capability; reference only saves final state dict)
    ckpt_every: int = 0             # 0 = only final
    resume: bool = False
    # Migrate a reference torch checkpoint (torch.save(model.state_dict()),
    # run-nerf.py:420-437): initialize params from the nn.pt at this path
    # (utils/torch_interop.py). With --render_only the imported weights are
    # rendered directly; the occupancy grid the .pt does not carry is
    # rebuilt from the imported densities. --resume (an orbax full-state
    # checkpoint) takes precedence when both are given.
    import_torch_ckpt: Optional[str] = None
    # Adaptive-ladder K swaps compile the new executable on a background
    # thread while training continues at the old K (train/loop.py) — at
    # full scale a ladder level costs ~50 s of XLA compile vs ~0.3 s per
    # chunk. None = auto: on iff the host has spare cores (os.cpu_count()
    # > 2; on a 1-core host the compile starves the dispatch thread and
    # async measured SLOWER). False = compile-blocking swaps whose step
    # schedule is exactly reproducible.
    async_ladder: Optional[bool] = None
    # Divergence guard (train/loop.py::DivergenceGuard): a non-finite loss
    # always halts (Adam params are already poisoned); a train-PSNR collapse
    # (>10 dB below the best seen) warns, and additionally halts when this
    # is set. Motivated by two real silent 8k-step divergences (BASELINE.md:
    # the r3 dilated-od collapse and the r4 occ-reg "both" arms).
    halt_on_divergence: bool = False


@dataclass(frozen=True)
class ParallelConfig:
    """Device mesh options (new; the reference is single-GPU)."""

    data_axis: str = "data"
    n_devices: int = 0              # 0 = all visible devices
    # Multi-process (multi-host) bring-up: call jax.distributed.initialize()
    # before the backend initializes (parallel/mesh.py::distributed_init).
    # On TPU pods everything autodetects from runtime metadata.
    distributed: bool = False


@dataclass(frozen=True)
class LogConfig:
    out_dir: str = "../out/"
    debug: bool = False
    render_only: bool = False
    use_wandb: bool = False         # wandb optional; JSON-lines always written
    # serialize the final compiled renderer (params/grid baked in) as an AOT
    # StableHLO serving artifact to this directory (utils/export.py)
    export_render: str = ""


@dataclass(frozen=True)
class Config:
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    log: LogConfig = field(default_factory=LogConfig)

    def replace(self, **sections) -> "Config":
        return dataclasses.replace(self, **sections)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(d: dict) -> "Config":
        def build(cls, sub):
            fields = {f.name: f for f in dataclasses.fields(cls)}
            kwargs = {}
            for k, v in sub.items():
                if k not in fields:
                    raise ValueError(f"Unknown config key: {cls.__name__}.{k}")
                if k == "skip" and isinstance(v, (list, tuple)):
                    v = tuple(int(s) for s in v)
                kwargs[k] = v
            return cls(**kwargs)

        sections = {}
        for f in dataclasses.fields(Config):
            if f.name in d:
                sections[f.name] = build(f.type if isinstance(f.type, type) else
                                         _SECTION_TYPES[f.name], d[f.name])
        return Config(**sections)

    def save_yaml(self, path: str) -> None:
        with open(path, "w") as fh:
            yaml.safe_dump(self.to_dict(), fh, sort_keys=False)

    @staticmethod
    def load_yaml(path: str) -> "Config":
        with open(path) as fh:
            return Config.from_dict(yaml.safe_load(fh))


_SECTION_TYPES = {
    "encoder": EncoderConfig,
    "model": ModelConfig,
    "data": DataConfig,
    "sampling": SamplingConfig,
    "train": TrainConfig,
    "parallel": ParallelConfig,
    "log": LogConfig,
}


def config_parser() -> argparse.ArgumentParser:
    """CLI mirroring src/utils/parser.py flag names (9 groups, 30+ flags).

    allow_abbrev=False: argparse prefix abbreviations (e.g. `--n_iter` for
    `--n_iters`) would be PARSED but invisible to _explicit_flags's exact
    token scan, so with --config the abbreviated flag would silently fail
    to override the YAML. Rejecting abbreviations makes the explicit-flag
    detection exact.
    """
    p = argparse.ArgumentParser(description="Train NeRF for view synthesis (TPU).",
                                allow_abbrev=False)
    g = p.add_argument_group("encoder")
    g.add_argument("--d_input", default=3, type=int)
    g.add_argument("--n_freqs", default=10, type=int)
    g.add_argument("--linear_freqs", action="store_true",
                   help="Use linearly spaced frequencies (default: log-spaced)")
    g.add_argument("--no_dirs", action="store_true")
    g.add_argument("--n_freqs_views", default=4, type=int)
    g.add_argument("--freq_reg_end", default=0, type=int,
                   help="FreeNeRF frequency-mask annealing steps (0 = off)")

    g = p.add_argument_group("model")
    g.add_argument("--model", choices=["nerf", "sinerf"], default="nerf")
    g.add_argument("--d_filter", default=256, type=int)
    g.add_argument("--n_layers", default=8, type=int)
    g.add_argument("--skip", default="4", type=str,
                   help="Comma-separated skip-connection layer indices")
    g.add_argument("--density_activation", choices=["none", "relu", "trunc_exp"],
                   default="none")
    g.add_argument("--fused_kernel", action="store_true", default=None,
                   help="Force the fused Pallas MLP train/inference kernels "
                        "on (default: auto — on for accelerator backends "
                        "with a plain NeRF)")
    g.add_argument("--no_fused_kernel", action="store_true",
                   help="Force the fused Pallas MLP kernels off")
    g.add_argument("--no_fused_save_acts", action="store_false",
                   dest="fused_save_acts", default=True,
                   help="Fused train kernel: recompute the trunk in the "
                        "backward instead of saving the activation chain "
                        "to HBM (identical gradients; saved-acts default "
                        "is +7.9%% on v5e, see BASELINE.md)")
    g.add_argument("--no_fused_encode", action="store_false",
                   dest="fused_encode", default=True,
                   help="Fused train kernel: precompute the positional "
                        "encoding in XLA instead of in-kernel "
                        "(ops/pallas/mlp_train.py::_encode_block)")
    g.add_argument("--no_fused_render", action="store_true",
                   help="Disable the fused MLP+composite+early-exit render "
                        "kernel for eval/video (on by default for nerf + "
                        "occgrid + single-chip)")

    g = p.add_argument_group("data")
    g.add_argument("--dataset", choices=["synthetic", "llff", "sphere", "lattice"],
                   default="synthetic")
    g.add_argument("--scene", default="lego", type=str)
    g.add_argument("--n_imgs", default=100, type=int)
    g.add_argument("--white_bkgd", action="store_true")
    g.add_argument("--factor", default=8, type=int)
    g.add_argument("--bd_factor", default=0.75, type=float)
    g.add_argument("--no_recenter", action="store_true")
    g.add_argument("--data_root", default="../datasets", type=str)
    g.add_argument("--downsample", default=1, type=int)

    g = p.add_argument_group("sampling")
    g.add_argument("--strategy", choices=["occgrid", "hierarchical"],
                   default="occgrid")
    g.add_argument("--n_samples", default=512, type=int)
    g.add_argument("--n_fine", default=128, type=int)
    g.add_argument("--render_step_size", default=5e-3, type=float)
    g.add_argument("--grid_resolution", default=128, type=int)
    g.add_argument("--occ_thre", default=1e-2, type=float)
    g.add_argument("--n_compact", default=192, type=int)
    g.add_argument("--compact_margin", default=1.0, type=float)
    g.add_argument("--no_adapt_compact", action="store_true",
                   help="Disable the adaptive compaction-K ladder")
    g.add_argument("--no_async_ladder", action="store_false",
                   dest="async_ladder", default=None,
                   help="Compile adaptive-K swaps synchronously (blocks "
                        "~50 s per ladder level at full scale, but the "
                        "step at which K switches is exactly reproducible; "
                        "default auto = async iff the host has spare cores)")
    g.add_argument("--early_stop_eps", default=1e-4, type=float)
    g.add_argument("--query_stride", default=0, type=int,
                   help="Occupancy-query sample stride (0 = auto)")
    g.add_argument("--query_dilation", default=None, type=int,
                   help="Query-table dilation radius (default: auto; each "
                        "unit doubles the lossless auto query stride)")
    g.add_argument("--query_max_stride", default=0, type=int,
                   help="Cap for the auto query stride (0 = 8)")
    g.add_argument("--update_interval", default=16, type=int,
                   help="Occupancy-grid refresh interval (nerfacc: 16)")
    g.add_argument("--update_interval_late", default=64, type=int,
                   help="Refresh interval after the grid converges "
                        "(0 = keep update_interval for the whole run)")
    g.add_argument("--update_interval_late_start", default=1024, type=int)
    g.add_argument("--grid_hold_steps", default=-1, type=int,
                   help="hold grid culling (all cells occupied) until this "
                        "step; -1 = auto (freq_reg_end when annealing)")

    g = p.add_argument_group("training")
    g.add_argument("--n_iters", default=20**3, type=int)
    g.add_argument("--batch_size", default=1024, type=int)
    g.add_argument("--lro", default=5e-4, type=float)
    g.add_argument("--decay_rate", default=0.1, type=float)
    g.add_argument("--Td", default=250000, type=int)
    g.add_argument("--scheduler", choices=["const", "exp"], default="exp")
    g.add_argument("--seed", default=42, type=int)
    g.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="bfloat16")
    g.add_argument("--halt_on_divergence", action="store_true",
                   help="Stop training when the divergence guard trips on a "
                        "train-PSNR collapse (non-finite loss always halts; "
                        "default: warn and keep training)")

    g = p.add_argument_group("parallel")
    g.add_argument("--n_devices", default=0, type=int,
                   help="Data-parallel device count (0 = all visible; "
                        "1 = force single-chip)")
    g.add_argument("--distributed", action="store_true",
                   help="Multi-process run: jax.distributed.initialize() "
                        "before the backend comes up (one process per host)")

    g = p.add_argument_group("validation")
    g.add_argument("--val", action="store_true")
    g.add_argument("--val_rate", default=500, type=int)
    # The reference PARSES --val_ratio (default 0.25, parser.py:134-137) but
    # never passes it to Splitter, whose own defaults (0.15/0.15,
    # splitter.py:31-32) are what every reference run actually used. The
    # 0.15 defaults here match that effective behavior; unlike the
    # reference, these flags are actually consumed (data/splitter.py).
    g.add_argument("--val_ratio", default=0.15, type=float,
                   help="Fraction of views K-means-selected for validation "
                        "(reference effective default 0.15 — its --val_ratio "
                        "flag was dead)")
    g.add_argument("--test_ratio", default=0.15, type=float,
                   help="Fraction of views K-means-selected for the test "
                        "split (selected before val, splitter.py:48-67)")

    g = p.add_argument_group("regularizers")
    g.add_argument("--ao", default=None, type=float)
    g.add_argument("--reg_ratio", default=0.5, type=float)
    g.add_argument("--reg", choices=["l1", "l2"], default="l1")
    g.add_argument("--a", default=None, type=float)
    g.add_argument("--b", default=None, type=float)
    g.add_argument("--func", choices=["linear", "exp"], default="linear")
    g.add_argument("--beta", default=None, type=float)

    g = p.add_argument_group("logging")
    g.add_argument("--out_dir", default="../out/", type=str)
    g.add_argument("--use_wandb", action="store_true")
    g.add_argument("--ckpt_every", default=0, type=int)
    g.add_argument("--resume", action="store_true")
    g.add_argument("--import_torch_ckpt", default=None, type=str,
                   help="reference nn.pt state dict to initialize/render from")
    g.add_argument("--export_render", default="", type=str,
                   help="write an AOT StableHLO serving artifact of the "
                        "final renderer to this directory")

    g = p.add_argument_group("debugging")
    g.add_argument("--debug", action="store_true")
    g.add_argument("--render_only", action="store_true")

    g = p.add_argument_group("config-file")
    g.add_argument("--config", default=None, type=str,
                   help="YAML config file (CLI flags override)")
    return p


# argparse dest -> (config section, field). Flags not listed here need
# special handling (skip/linear_freqs) or aren't config fields (--config).
_FLAG_MAP = {
    "d_input": ("encoder", "d_input"),
    "n_freqs": ("encoder", "n_freqs"),
    "n_freqs_views": ("encoder", "n_freqs_views"),
    "no_dirs": ("encoder", "no_dirs"),
    "freq_reg_end": ("encoder", "freq_reg_end"),
    "model": ("model", "model"),
    "d_filter": ("model", "d_filter"),
    "n_layers": ("model", "n_layers"),
    "density_activation": ("model", "density_activation"),
    "fused_kernel": ("model", "fused_kernel"),
    "fused_save_acts": ("model", "fused_save_acts"),
    "fused_encode": ("model", "fused_encode"),
    "dataset": ("data", "dataset"),
    "scene": ("data", "scene"),
    "n_imgs": ("data", "n_imgs"),
    "white_bkgd": ("data", "white_bkgd"),
    "factor": ("data", "factor"),
    "bd_factor": ("data", "bd_factor"),
    "no_recenter": ("data", "no_recenter"),
    "data_root": ("data", "data_root"),
    "downsample": ("data", "downsample"),
    "strategy": ("sampling", "strategy"),
    "n_samples": ("sampling", "n_samples"),
    "n_fine": ("sampling", "n_fine"),
    "render_step_size": ("sampling", "render_step_size"),
    "grid_resolution": ("sampling", "grid_resolution"),
    "occ_thre": ("sampling", "occ_thre"),
    "n_compact": ("sampling", "n_compact"),
    "compact_margin": ("sampling", "compact_margin"),
    "early_stop_eps": ("sampling", "early_stop_eps"),
    "query_stride": ("sampling", "query_stride"),
    "query_dilation": ("sampling", "query_dilation"),
    "query_max_stride": ("sampling", "query_max_stride"),
    "update_interval": ("sampling", "update_interval"),
    "update_interval_late": ("sampling", "update_interval_late"),
    "update_interval_late_start": ("sampling", "update_interval_late_start"),
    "grid_hold_steps": ("sampling", "grid_hold_steps"),
    "n_iters": ("train", "n_iters"),
    "batch_size": ("train", "batch_size"),
    "lro": ("train", "lro"),
    "decay_rate": ("train", "decay_rate"),
    "Td": ("train", "Td"),
    "scheduler": ("train", "scheduler"),
    "seed": ("train", "seed"),
    "dtype": ("train", "dtype"),
    "ao": ("train", "ao"),
    "reg_ratio": ("train", "reg_ratio"),
    "reg": ("train", "reg"),
    "a": ("train", "occ_a"),
    "b": ("train", "occ_b"),
    "func": ("train", "occ_func"),
    "beta": ("train", "beta"),
    "val": ("train", "val"),
    "val_rate": ("train", "val_rate"),
    "val_ratio": ("data", "val_ratio"),
    "test_ratio": ("data", "test_ratio"),
    "ckpt_every": ("train", "ckpt_every"),
    "resume": ("train", "resume"),
    "import_torch_ckpt": ("train", "import_torch_ckpt"),
    "async_ladder": ("train", "async_ladder"),
    "halt_on_divergence": ("train", "halt_on_divergence"),
    "n_devices": ("parallel", "n_devices"),
    "distributed": ("parallel", "distributed"),
    "out_dir": ("log", "out_dir"),
    "debug": ("log", "debug"),
    "render_only": ("log", "render_only"),
    "use_wandb": ("log", "use_wandb"),
    "export_render": ("log", "export_render"),
}


def config_from_args(argv=None) -> Config:
    """CLI + optional YAML -> Config.

    Overrides are MERGED into the base config section-by-section with
    dataclasses.replace, so YAML fields without a CLI flag (val_ratio,
    ema_decay, warmup_steps, ...) survive a --config round-trip. With a
    config file, only flags explicitly present on the command line override
    it; without one, all parser values apply (they equal the dataclass
    defaults).
    """
    parser = config_parser()
    args = parser.parse_args(argv)
    raw_yaml = None
    if args.config:
        with open(args.config) as fh:
            raw_yaml = yaml.safe_load(fh) or {}
    base = Config.from_dict(raw_yaml) if raw_yaml is not None else Config()
    explicit = _explicit_flags(parser, argv)
    use_all = args.config is None

    overrides: dict = {}
    for dest, (section, fname) in _FLAG_MAP.items():
        if use_all or dest in explicit:
            overrides.setdefault(section, {})[fname] = getattr(args, dest)
    if use_all or "linear_freqs" in explicit:
        overrides.setdefault("encoder", {})["log_space"] = \
            not args.linear_freqs
    if use_all or "skip" in explicit:
        overrides.setdefault("model", {})["skip"] = tuple(
            int(s) for s in str(args.skip).split(",") if s != "")
    if use_all or "no_adapt_compact" in explicit:
        overrides.setdefault("sampling", {})["adapt_compact"] = \
            not args.no_adapt_compact
    if use_all or "no_fused_render" in explicit:
        overrides.setdefault("model", {})["fused_render"] = \
            not args.no_fused_render
    if args.no_fused_kernel:
        overrides.setdefault("model", {})["fused_kernel"] = False

    # grid_levels has no CLI flag; derive from the dataset type
    # (run-nerf.py:92-93) unless the YAML pins it explicitly.
    yaml_has_gl = bool(raw_yaml
                       and "grid_levels" in (raw_yaml.get("sampling") or {}))
    if not yaml_has_gl:
        ds = overrides.get("data", {}).get("dataset", base.data.dataset)
        overrides.setdefault("sampling", {})["grid_levels"] = \
            1 if ds != "llff" else 4

    sections = {
        name: dataclasses.replace(getattr(base, name), **ov)
        for name, ov in overrides.items()
    }
    return base.replace(**sections)


def _explicit_flags(parser, argv) -> set:
    """Names of flags explicitly present on the command line."""
    import sys
    tokens = list(sys.argv[1:] if argv is None else argv)
    names = set()
    for action in parser._actions:
        for opt in action.option_strings:
            if any(t == opt or t.startswith(opt + "=") for t in tokens):
                names.add(action.dest)
    return names
