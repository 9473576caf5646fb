"""Training driver: builds models/optimizers/steps from a yml config and runs.

The TPU twin of ``train_rgbd.py:261-474``. Responsibilities:

- model construction per ``generator_architecture`` (``train_rgbd.py:220-258``)
- optimizer wiring incl. the stylegan mapping at alpha/100 and the l1/l2
  per-param override (``train_rgbd.py:314-343``)
- the iteration loop with the piecewise-linear stage schedule; a new jitted
  step is compiled whenever the *static* spec changes (stage floor crossing,
  ``start_rotation``/``start_occlusion_aware`` flips) — a handful of
  compiles per run
- extensions: snapshots, preview grids, JSONL+console logging with the
  reference's report-key schema (``train_rgbd.py:369-403``)
- resume: explicit iteration or auto-resume scan (``train_rgbd.py:406-459``)
- distribution: optional 1-D mesh data parallelism (``use_mpi`` yml key maps
  to "use every visible device")
- profiling: ``nvprof``/``enable_cuda_profiling`` yml keys map to a 10-step
  ``jax.profiler`` trace run (SURVEY §5.1)
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..core.stage import decompose_stage, parse_stage_interval, stage_at
from ..data.dataset import ImageDataset, prepare_dataset
from ..eval.preview import sample_generate_light
from ..geometry.prior import CameraParamPrior
from ..models.discriminator import Discriminator
from ..models.generators import (
    DCGANGenerator,
    StyleGANGenerator,
    dcgan_make_hidden,
    stylegan_make_hidden,
)
from ..parallel.mesh import DATA_AXIS, is_master, make_mesh, replicate, shard_batch, shard_train_step
from . import checkpoint as ckpt
from .optim import make_optimizer, make_stylegan_gen_optimizer
from .state import TrainState
from .steps import StepSpec, make_rgb_train_step, make_rgbd_train_step

REPORT_KEYS = [
    "iteration",
    "elapsed_time",
    "stage",
    "batch_size",
    "image_size",
    "gen/loss_adv",
    "dis/loss_adv",
    "gen/loss_recon",
    "dis/loss_gp",
    "gen/loss_rotate",
    "gen/loss_occupancy",
]


def setup_generator(config):
    """Model factory mirroring ``train_rgbd.py:220-246`` (incl. the DCGAN
    in_ch=config.ch quirk). ``mixed16: True`` (the yml twin of Chainer's
    mixed16 global dtype) runs the conv stacks in bf16."""
    rgbd = not bool(config.rgb)
    arch = config.generator_architecture
    initial_depth = config.initial_depth if config.initial_depth is not None else 1.0
    compute_dtype = jnp.bfloat16 if config.mixed16 else None
    if arch == "stylegan":
        gen = StyleGANGenerator(
            config.ch,
            enable_blur=bool(config.enable_blur),
            rgbd=rgbd,
            rotate_conv_input=bool(config.rotate_conv_input),
            use_occupancy_net=bool(config.use_occupancy_net_loss),
            initial_depth=initial_depth,
            compute_dtype=compute_dtype,
        )
        make_hidden = lambda key, n: stylegan_make_hidden(key, n, config.ch)
    elif arch == "dcgan":
        gen = DCGANGenerator(
            in_ch=config.ch,  # quirk: hidden width stays the default 512
            enable_blur=bool(config.enable_blur),
            rgbd=rgbd,
            use_occupancy_net=bool(config.use_occupancy_net_loss),
            initial_depth=initial_depth,
            compute_dtype=compute_dtype,
        )
        make_hidden = lambda key, n: dcgan_make_hidden(key, n, config.ch)
    elif arch == "deepvoxels":
        from ..models.deepvoxels import build_deepvoxels_generator

        return build_deepvoxels_generator(config)
    else:
        raise ValueError(f"{arch} is not supported")
    return gen, make_hidden


def setup_discriminator(config):
    if config.bigan:
        raise NotImplementedError(
            "bigan is not supported (the reference asserts False on it too, updater.py:330)"
        )
    return Discriminator(
        ch=config.ch,
        enable_blur=bool(config.enable_blur),
        sn=bool(config.sn),
        res=bool(config.res_dis),
        compute_dtype=jnp.bfloat16 if config.mixed16 else None,
    )


class Trainer:
    """Owns state + compiled-step cache and runs the iteration loop."""

    def __init__(self, config: Config, dataset: Optional[np.ndarray] = None, seed: int = 0):
        if config.optical_flow:
            raise NotImplementedError("optical flow loss is not supported (updater.py:374)")
        self.config = config
        self.seed = seed
        self.use_mesh = bool(config.use_mpi) and jax.device_count() > 1
        self.mesh = make_mesh() if self.use_mesh else None
        self.fleet_size = jax.device_count() if self.use_mesh else 1

        self.arch = config.generator_architecture
        self.rgb = bool(config.rgb)
        if config.r1_interval and int(config.r1_interval) > 1 and self.arch == "deepvoxels":
            # lazy R1 is only implemented by the rgbd/rgb steps; the
            # deepvoxels step would silently ignore the interval and apply
            # R1 every iteration at 1x weight — fail fast instead.
            raise ValueError(
                "r1_interval > 1 is not supported by the deepvoxels step "
                "(lazy R1 is implemented for the stylegan/dcgan rgbd+rgb paths only)"
            )
        self.gen, self.make_hidden = setup_generator(config)
        self.dis = setup_discriminator(config)

        self.stage_interval = parse_stage_interval(config.stage_interval)
        # NB: the reference's fleet-size schedule compression
        # (RunningHelper.stage_interval, train_rgbd.py:133-135) is dead code
        # in the shipped path — the updaters parse config.stage_interval (a
        # comma string the property would TypeError on) directly, unscaled
        # (updater.py:242). Faithful behaviour: no scaling.
        self.max_stage = config.max_stage

        self.prior = CameraParamPrior(config)
        self.batch_size = config.batchsize
        self.local_batch = self.batch_size  # per-device batch under DP
        if self.use_mesh:
            assert self.batch_size % self.fleet_size == 0
            self.local_batch = self.batch_size // self.fleet_size

        # optimizers: one per clipping domain (train_rgbd.py:314-343)
        a_g, a_d = config.adam_alpha_g, config.adam_alpha_d
        b1, b2 = config.adam_beta1, config.adam_beta2
        if self.arch == "stylegan":
            self.opt_map = make_optimizer(a_g / 100, b1, b2)
            self.opt_gen = make_stylegan_gen_optimizer(a_g, b1, b2, rgbd=not self.rgb)
        elif self.arch == "deepvoxels":
            self.opt_map = make_optimizer(a_g / 100, b1, b2)
            self.opt_gen = make_optimizer(a_g, b1, b2)
        else:
            self.opt_map = None
            self.opt_gen = make_optimizer(a_g, b1, b2)
        self.opt_dis = make_optimizer(a_d, b1, b2)

        self.state = self._init_state()
        self.rng_key = jax.random.PRNGKey(seed)

        if dataset is None:
            dataset = prepare_dataset(config)
        shard_index = jax.process_index() if self.use_mesh else 0
        num_shards = jax.process_count() if self.use_mesh else 1
        # normalize=False: batches leave the host as uint8 (4x less
        # host->device traffic; the jitted step converts to [-1, 1] f32 with
        # the same arithmetic the host pipeline used — see steps.py)
        self.iterator = ImageDataset(
            dataset, self.batch_size // max(num_shards, 1), seed=seed,
            shard_index=shard_index, num_shards=max(num_shards, 1),
            normalize=False,
        )

        self._step_cache: Dict[StepSpec, Callable] = {}
        self._extensions = []
        self._preview_warned = False
        self.metrics_log: list = []
        self.out = config.out or "out"

    # ------------------------------------------------------------------

    def _init_state(self) -> TrainState:
        from ..geometry.camera import camera_matrices

        key = jax.random.PRNGKey(self.seed)
        kz, kg, kd = jax.random.split(key, 3)
        z = self.make_hidden(kz, self.local_batch)
        theta9 = None if self.rgb else jnp.zeros((self.local_batch, 9))
        gen_state = None
        if self.arch == "deepvoxels":
            mats = camera_matrices(jnp.zeros((self.local_batch, 6)))
            gen_vars = self.gen.init(kg, z, mats, z, theta9, method=self.gen.init_all)
            gen_state = gen_vars.get("batch_stats")
        else:
            gen_vars = self.gen.init(kg, z, theta9, method=self.gen.init_all)
        dis_vars = self.dis.init(kd, jnp.ones((2, 4, 4, 3)), method=self.dis.init_all)
        params_gen = gen_vars["params"]
        params_dis = dis_vars["params"]
        sn_state = dis_vars.get("sn")

        if self.arch == "stylegan":
            opt_map_state = self.opt_map.init(params_gen["mapping"])
            opt_gen_state = self.opt_gen.init(params_gen["gen"])
        elif self.arch == "deepvoxels":
            # mapping has its own alpha/100 optimizer AND is included in the
            # whole-generator optimizer (train_rgbd.py:335-343 quirk)
            opt_map_state = self.opt_map.init(params_gen["mapping"])
            opt_gen_state = self.opt_gen.init(params_gen)
        else:
            opt_map_state = None
            opt_gen_state = self.opt_gen.init(params_gen)
        opt_dis_state = self.opt_dis.init(params_dis)

        # EMA runs on ALL processes (identical compiled programs under one
        # shard_map — a per-process difference would deadlock a multi-host
        # slice); only I/O is master-gated. Real copies: the state is donated
        # to the jitted step, and donating aliased params/EMA buffers twice
        # is an XLA error.
        keep_ema = bool(self.config.keep_smoothed_gen)
        ema = jax.tree_util.tree_map(jnp.copy, params_gen) if keep_ema else None
        return TrainState(
            params_gen=params_gen,
            params_dis=params_dis,
            opt_map=opt_map_state,
            opt_gen=opt_gen_state,
            opt_dis=opt_dis_state,
            ema_gen=ema,
            sn_state=sn_state,
            iteration=jnp.int32(0),
            gen_state=gen_state,
        )

    # ------------------------------------------------------------------

    def _spec_for(self, iteration: int, stage_floor: int) -> StepSpec:
        c = self.config
        use_rotate = (not self.rgb) and iteration > (c.start_rotation or 0)
        occl = iteration >= (c.start_occlusion_aware or 0)
        if self.arch == "deepvoxels":
            stage_floor = 8
        return StepSpec(
            architecture=self.arch,
            stage_floor=stage_floor,
            batch_size=self.local_batch,
            use_rotate=use_rotate,
            occlusion_aware=occl,
            rotate_feature=bool(c.rotate_feature),
            use_occupancy=bool(c.use_occupancy_net_loss),
            sn=bool(c.sn),
            keep_smoothed_gen=bool(c.keep_smoothed_gen),
            smoothing=c.smoothing if c.smoothing is not None else 0.999,
            lambda_gp=c.lambda_gp if c.lambda_gp is not None else 1.0,
            lambda_depth=c.lambda_depth if c.lambda_depth is not None else 0.0,
            depth_min=c.depth_min if c.depth_min is not None else 0.6,
            lambda_geometric=c.lambda_geometric if c.lambda_geometric else 3.0,
            lambda_rotate=c.lambda_rotate if c.lambda_rotate else 2.0,
            lambda_occupancy=c.lambda_occupancy if c.lambda_occupancy else 1.0,
            r1_interval=int(c.r1_interval) if c.r1_interval else 1,
            gather_mode=self._gather_mode(),
            axis_name=DATA_AXIS if self.use_mesh else None,
            max_stage=self.max_stage,
        )

    def _gather_mode(self) -> str:
        """The 3D-consistency gather route: explicit yml key, else the
        hybrid route on TPU (native-gather forward + scatter-free one-hot
        custom-VJP backward — the fastest measured on a v5e; 'onehot' and
        'pallas' are within a few percent), plain gather elsewhere."""
        if self.config.gather_mode:
            return str(self.config.gather_mode)
        return "hybrid" if jax.default_backend() not in ("cpu",) else "xla"

    def _make_raw_step(self, spec: StepSpec) -> Callable:
        """The un-jitted per-device step for ``spec``."""
        if self.arch == "deepvoxels":
            from .steps_deepvoxels import make_deepvoxels_train_step

            c = self.config
            return make_deepvoxels_train_step(
                self.gen, self.dis, self.make_hidden, self.prior, self.opt_map,
                self.opt_gen, self.opt_dis, spec,
                focal_loss_gamma=c.focal_loss_gamma if c.focal_loss_gamma else 0.0,
                background_generator=bool(c.background_generator),
            )
        if self.rgb:
            return make_rgb_train_step(
                self.gen, self.dis, self.make_hidden, self.opt_map, self.opt_gen,
                self.opt_dis, spec,
            )
        return make_rgbd_train_step(
            self.gen, self.dis, self.make_hidden, self.prior, self.opt_map,
            self.opt_gen, self.opt_dis, spec,
        )

    def _compiled_step(self, spec: StepSpec) -> Callable:
        if spec in self._step_cache:
            return self._step_cache[spec]
        step = self._make_raw_step(spec)
        if self.use_mesh:
            fn = shard_train_step(step, self.mesh)
        else:
            # donate the state: params/opt buffers are updated in place in
            # HBM instead of being reallocated every step
            fn = jax.jit(step, donate_argnums=(0,))
        self._step_cache[spec] = fn
        return fn

    def _compiled_windowed_step(self, spec: StepSpec, window: int) -> Callable:
        """K steps chained on device (``steps.make_windowed_step``)."""
        cache_key = (spec, window)
        if cache_key in self._step_cache:
            return self._step_cache[cache_key]
        from ..parallel.mesh import shard_windowed_step
        from .steps import make_windowed_step

        wstep = make_windowed_step(self._make_raw_step(spec), window)
        if self.use_mesh:
            fn = shard_windowed_step(wstep, self.mesh)
        else:
            fn = jax.jit(wstep, donate_argnums=(0,))
        self._step_cache[cache_key] = fn
        return fn

    def _window_len(
        self, it: int, spec: StepSpec, total: int, k_max: int,
        preview_interval: int, snapshot_interval: int,
    ) -> int:
        """Longest window starting after ``it`` completed iterations whose
        members all share ``spec`` (one compiled program) and whose interior
        crosses no preview/snapshot boundary (those need materialised
        state on the host)."""
        k = min(k_max, total - it)
        n = 1
        while n < k:
            if (it + n) % preview_interval == 0 or (it + n) % snapshot_interval == 0:
                break
            floor_n, _ = decompose_stage(self.stage(it + n), self.max_stage)
            if self._spec_for(it + n, floor_n) != spec:
                break
            n += 1
        return n

    # ------------------------------------------------------------------

    def stage(self, iteration: Optional[int] = None) -> float:
        if self.arch == "deepvoxels":
            return 8.5  # pinned (updater_deepvoxels.py:105-106)
        it = int(self.state.iteration) if iteration is None else iteration
        return stage_at(it, self.stage_interval, self.max_stage)

    def gen_apply_eval(self, z, stage_floor, alpha, theta9, mats=None, *, use_ema=False):
        """Eval-mode generator forward from the live train state.

        ``use_ema=True`` renders from the smoothed generator — the model the
        reference previews/evaluates when ``keep_smoothed_gen``
        (``train_rgbd.py:391-396``).
        """
        params = self.state.params_gen
        if use_ema:
            if self.state.ema_gen is None:
                raise ValueError("use_ema requires keep_smoothed_gen (no EMA params in state)")
            params = self.state.ema_gen
        if self.arch == "deepvoxels":
            # second style latent: fixed-seed draw tiled like z (train_rgbd.py:70-71)
            rng = np.random.RandomState(1)
            cols = 8
            rows = z.shape[0] // cols
            if rows * cols == z.shape[0]:
                z2 = self.make_hidden_np(rng, cols)
                z2 = np.tile(z2[:, None], (1, rows, 1)).reshape(z.shape[0], -1)
            else:
                # non-grid batch (e.g. tools/validate_3d_structure.py sweeps):
                # per-sample fixed-seed draw; the 8-column preview-grid tiling
                # above stays bit-identical for grid-shaped batches
                z2 = self.make_hidden_np(rng, z.shape[0])
            variables = {"params": params}
            if self.state.gen_state is not None:
                variables["batch_stats"] = self.state.gen_state
            return self.gen.apply(
                variables, z, mats, jnp.asarray(z2), theta9, train=False
            )
        return self.gen.apply(
            {"params": params}, z, stage_floor, alpha, theta9, train=False
        )

    def gen_apply_eval_ema(self, z, stage_floor, alpha, theta9, mats=None):
        """Smoothed-generator eval forward (see ``gen_apply_eval``)."""
        return self.gen_apply_eval(z, stage_floor, alpha, theta9, mats, use_ema=True)

    def make_hidden_np(self, rng: np.random.RandomState, n: int):
        """Host-side latent sampler for fixed-seed previews."""
        c = self.config
        if self.arch == "stylegan":
            z = rng.normal(size=(n, c.ch * 2)).astype("float32")
            return z / np.sqrt((z**2).sum(axis=1, keepdims=True) / c.ch + 1e-8)
        if self.arch == "deepvoxels":
            return rng.normal(size=(n, c.ch)).astype("float32")
        z = rng.normal(size=(n, c.ch)).astype("float32")
        return z / np.sqrt((z**2).sum(axis=1, keepdims=True) / c.ch + 1e-8)

    # ------------------------------------------------------------------

    def resume(self) -> bool:
        """Explicit or auto resume (``train_rgbd.py:406-459``)."""
        c = self.config
        names = ckpt.model_names(c)
        if c.get_model_from_interation:
            tag = str(c.get_model_from_interation)
            self.state, self.rng_key = ckpt.load_snapshot(
                self.out, self.state, self.rng_key, tag, c
            )
            return True
        if c.auto_resume:
            auto_dir = c.auto_resume_dir if c.auto_resume_dir else self.out
            tag = ckpt.scan_auto_resume(auto_dir, names)
            if tag is not None:
                self.state, self.rng_key = ckpt.load_snapshot(
                    auto_dir, self.state, self.rng_key, tag, c
                )
                return True
        return False

    def save(self, tag: str) -> None:
        if is_master():
            ckpt.save_snapshot(self.out, self.state, self.rng_key, tag, self.config)

    # ------------------------------------------------------------------

    def run(
        self,
        iterations: Optional[int] = None,
        log_cb: Optional[Callable[[Dict[str, Any]], None]] = None,
    ) -> Dict[str, Any]:
        c = self.config
        total = iterations if iterations is not None else c.iteration
        if c.nvprof or c.enable_cuda_profiling:
            total = 10  # short profiled run (train_rgbd.py:363-364)
            jax.profiler.start_trace(os.path.join(self.out, "profile"))

        snapshot_interval = c.snapshot_interval or 10000
        display_interval = c.display_interval or 100
        preview_interval = c.evaluation_sample_interval or 500

        preview = sample_generate_light(
            self.gen_apply_eval, self.make_hidden_np, self.out, c
        )
        # the reference also previews the smoothed generator into its own
        # subdir when keep_smoothed_gen (train_rgbd.py:391-396)
        preview_smoothed = None
        if bool(c.keep_smoothed_gen):
            preview_smoothed = sample_generate_light(
                self.gen_apply_eval_ema, self.make_hidden_np, self.out, c,
                subdir="preview_smoothed",
            )

        # device-side step windowing (steps.make_windowed_step): chain K
        # iterations in one compiled program — one dispatch + one NaN-guard
        # fetch per window instead of per step (each fetch is a full host
        # roundtrip on a remote-dispatch runtime). RNG keys are pre-split on
        # the host exactly as the unwindowed loop would, so training follows
        # the same stream; windows never cross spec changes or
        # preview/snapshot boundaries. Off by default (step_window: 1).
        step_window = max(int(c.step_window or 1), 1)

        start_time = time.time()
        last_log: Dict[str, Any] = {}
        state_replicated = False
        # host-side iteration mirror: reading state.iteration is a device
        # fetch (a full tunnel roundtrip per loop otherwise)
        it_host = int(self.state.iteration)

        def emit_row(row):
            nonlocal last_log
            self.metrics_log.append(row)
            last_log = row
            if log_cb:
                log_cb(row)
            if is_master() and self.out:
                os.makedirs(self.out, exist_ok=True)
                with open(os.path.join(self.out, "log.jsonl"), "a") as f:
                    f.write(json.dumps(row) + "\n")

        def plan_k(it: int) -> int:
            """Window length the loop will choose at position ``it`` (the
            plan is host-deterministic, so batches can be uploaded ahead)."""
            if it >= total:
                return 0
            floor_p, _ = decompose_stage(self.stage(it), self.max_stage)
            spec_p = self._spec_for(it, floor_p)
            if step_window <= 1:
                return 1
            k = self._window_len(
                it, spec_p, total, step_window, preview_interval, snapshot_interval
            )
            # a tail shorter than the full window runs as single steps: each
            # distinct window length is its own compiled program, and a
            # multi-minute compile costs far more than K-1 unwindowed steps
            return k if k == step_window else 1

        def upload_batches(k: int):
            """Draw + start uploading k batches (async device transfer —
            overlaps with whatever the device is currently running)."""
            if k == 1:
                x = np.asarray(self.iterator.next())
                return shard_batch(x, self.mesh) if self.use_mesh else jnp.asarray(x)
            xs = np.stack([np.asarray(self.iterator.next()) for _ in range(k)])
            return (
                shard_batch(xs, self.mesh, batch_axis=1)
                if self.use_mesh
                else jnp.asarray(xs)
            )

        # double-buffered input pipeline: the batch for window N+1 is
        # uploaded right after window N is dispatched, so the host->device
        # transfer hides under the device compute instead of serialising
        # with it (the transfer path may be slow, e.g. a network tunnel)
        prefetched = None  # (it_expected, k, device_array)

        if self.use_mesh and not state_replicated:
            self.state = replicate(self.state, self.mesh)
            state_replicated = True

        while it_host < total:
            it = it_host
            st = self.stage(it)
            floor, alpha = decompose_stage(st, self.max_stage)
            spec = self._spec_for(it, floor)
            k_window = plan_k(it)

            if prefetched is not None and prefetched[0] == it and prefetched[1] == k_window:
                xw = prefetched[2]
            else:
                xw = upload_batches(k_window)
            prefetched = None

            if k_window > 1:
                step = self._compiled_windowed_step(spec, k_window)
                alphas = jnp.asarray(
                    [
                        decompose_stage(self.stage(it + j), self.max_stage)[1]
                        for j in range(k_window)
                    ],
                    jnp.float32,
                )
                keys = []
                for _ in range(k_window):
                    self.rng_key, step_key = jax.random.split(self.rng_key)
                    keys.append(step_key)
                keys = jnp.stack(keys)
                self.state, wmetrics = step(self.state, xw, alphas, keys)

                k_next = plan_k(it + k_window)
                if k_next:
                    prefetched = (it + k_window, k_next, upload_batches(k_next))

                rows_j = [
                    j for j in range(k_window)
                    if (it + j + 1) % display_interval == 0 or (it + j + 1) == total
                ]
                # one host transfer per window; per-iteration NaN guard
                # preserved through the stacked metrics
                fetched = (
                    jax.device_get(wmetrics)
                    if rows_j
                    else {"nan": jax.device_get(wmetrics["nan"])}
                )
                nans = np.asarray(fetched["nan"])
                if nans.any():
                    bad = int(np.argmax(nans))
                    raise FloatingPointError(
                        f"NaN loss at iteration {it + bad + 1} "
                        f"(stage {self.stage(it + bad):.3f})"
                    )
                for j in rows_j:
                    row = {
                        "iteration": it + j + 1,
                        "elapsed_time": time.time() - start_time,
                        "batch_size": float(self.batch_size),
                    }
                    for k, v in fetched.items():
                        if k != "nan":
                            row[k] = float(np.asarray(v)[j])
                    emit_row(row)
                it_host += k_window
                it = it_host
            else:
                step = self._compiled_step(spec)

                self.rng_key, step_key = jax.random.split(self.rng_key)
                self.state, metrics = step(self.state, xw, jnp.float32(alpha), step_key)

                k_next = plan_k(it + 1)
                if k_next:
                    prefetched = (it + 1, k_next, upload_batches(k_next))

                it_host += 1
                it = it_host
                if it % display_interval == 0 or it == total:
                    # one batched host transfer for the whole metrics dict (each
                    # individual device_get costs a full tunnel roundtrip)
                    fetched = jax.device_get(metrics)
                    if bool(fetched["nan"]):
                        raise FloatingPointError(
                            f"NaN loss at iteration {it} (stage {st:.3f})"
                        )
                    row = {
                        "iteration": it,
                        "elapsed_time": time.time() - start_time,
                        "batch_size": float(self.batch_size),
                    }
                    for k, v in fetched.items():
                        if k != "nan":
                            row[k] = float(v)
                    emit_row(row)
                else:
                    # NaN guard still fires every iteration (reference asserts,
                    # updater.py:336,439) at the cost of a single scalar fetch
                    if bool(jax.device_get(metrics["nan"])):
                        raise FloatingPointError(
                            f"NaN loss at iteration {it} (stage {st:.3f})"
                        )

            if is_master() and it % preview_interval == 0:
                try:
                    preview(it, self.stage(it))
                    if preview_smoothed is not None:
                        preview_smoothed(it, self.stage(it))
                except Exception:
                    # best-effort, but never silently: a broken preview path
                    # should not go unnoticed for an entire run
                    if not self._preview_warned:
                        self._preview_warned = True
                        import traceback
                        import warnings

                        warnings.warn(
                            "preview rendering failed (training continues; "
                            "further failures suppressed):\n" + traceback.format_exc()
                        )

            if it % snapshot_interval == 0:
                self.save(str(it))

        if c.nvprof or c.enable_cuda_profiling:
            jax.profiler.stop_trace()
        self.save("latest")
        return last_log
