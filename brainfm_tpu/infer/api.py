"""High-level inference API.

Parity with /root/reference/utils/test_utils.py:290-405 (`evaluate_image`,
`evaluate_path`) and :45-57 (`get_deformed_atlas`), restructured so the
model is built, loaded and jitted ONCE (the reference rebuilds per call —
test_utils.py:300-301, flagged in SURVEY.md §3.3).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..config import AttrDict, load_config
from ..models.build import apply_processors, build_model, postprocess
from ..ops.interp import trilinear3d
from ..utils.nifti import MRIread, viewVolume
from .prepare import prepare_image
from .tiles import tiled_apply


class Inferencer:
    """Load once, jit once, evaluate many
    (replaces evaluate_image/evaluate_path per-call rebuilds)."""

    def __init__(self, cfg: AttrDict, ckpt_path: str | None = None,
                 compute_dtype=jnp.float32, exact: bool = True, mesh=None):
        # precision is scoped to THIS model's traces (a global
        # jax.config.update here would leak: a later bf16 Inferencer in
        # the same process would silently run at "highest" too)
        self._precision = "highest" if exact else None
        # optional multi-chip whole-volume mode: a jax.sharding.Mesh with
        # a 'space' axis shards the volume depth-wise across chips (GSPMD
        # partitions the convs with exact halo exchange; the UNet's
        # deep-level replication guard engages under set_mesh) — whole
        # volumes larger than one chip's HBM run without tiling, the
        # multi-chip analog of evaluate_tiled
        self.mesh = mesh
        self.cfg, self.model = build_model(cfg, compute_dtype=compute_dtype)
        if ckpt_path and ckpt_path.endswith((".pth", ".pt")):
            from ..models.torch_import import import_checkpoint

            self.params = import_checkpoint(ckpt_path)
        elif ckpt_path:
            from ..train.checkpoint import latest_checkpoint

            # accept either a concrete ckpt_* directory or the ckp/ root
            # that save_checkpoint writes them into
            path = ckpt_path
            if os.path.isdir(ckpt_path) and not os.path.basename(
                    ckpt_path).startswith("ckpt_"):
                path = latest_checkpoint(ckpt_path)
            if not path or not os.path.isdir(path):
                raise FileNotFoundError(
                    f"no checkpoint found under {ckpt_path}")
            import orbax.checkpoint as ocp

            # params-only PARTIAL restore: the saved tree is a full
            # TrainState ({params, opt_state, step}) — untargeted restore
            # would also read the Adam moments (~3x the bytes and host
            # memory at the 264M flagship) just to discard them. The
            # abstract params template comes from eval_shape (no compute).
            try:
                n_levels = int(self.cfg.get("num_levels") or 5)
                e = max(2 ** (n_levels - 1), 16)
                ab = jax.eval_shape(
                    self.model.init, jax.random.PRNGKey(0),
                    jax.ShapeDtypeStruct((1, e, e, e, 1), jnp.float32))
                restored = ocp.PyTreeCheckpointer().restore(
                    os.path.abspath(path),
                    args=ocp.args.PyTreeRestore(item={"params": ab},
                                                partial_restore=True))
                self.params = restored["params"]
            except Exception:
                # template/tree mismatch (older layout, non-TrainState
                # save): fall back to the untargeted full restore
                restored = ocp.StandardCheckpointer().restore(
                    os.path.abspath(path))
                tree = restored.get("params", restored)
                self.params = tree if "params" in tree else {"params": tree}
        else:
            self.params = self._init_params()
        self._jitted = jax.jit(self._forward,
                               static_argnames=("keep_feat",))
        self._jitted_post = jax.jit(self._post)

    def _init_params(self):
        # conv params are spatial-size independent: init at the smallest
        # extent the pooling tower accepts (2^(levels-1)) instead of the
        # full inference size — and jitted (an eager flax init executes
        # the forward op-by-op at ~25 ms/dispatch over the relay)
        n_levels = int(self.cfg.get("num_levels") or 5)
        e = max(2 ** (n_levels - 1), 16)
        x = jnp.zeros((1, e, e, e, 1), jnp.float32)
        return jax.jit(self.model.init)(jax.random.PRNGKey(0), x)

    def _precision_ctx(self):
        import contextlib

        if self._precision:
            return jax.default_matmul_precision(self._precision)
        return contextlib.nullcontext()

    def _forward(self, params, x, keep_feat: bool = True):
        # params are threaded as a jit ARGUMENT, not closed over: a
        # closure would hand XLA the 264M-param flagship tree as graph
        # constants, and constant folding makes the 220^3 whole-volume
        # compile blow past 9 minutes (measured) vs ~160 s with args.
        # The context binds the precision while jit TRACES this function;
        # the compiled executable keeps it thereafter
        with self._precision_ctx():
            out = self.model.apply(params, x)
            out = apply_processors(out, self.cfg)
        if not keep_feat:
            # dropping the decoder feature pyramid lets XLA dead-code it:
            # at the 220^3 L6 flagship the feat list alone is ~2 GB of HBM
            # and is what pushed the whole-volume forward over the single
            # chip's memory — without it the 220^3 pass fits and runs in
            # one dispatch (573 ms bf16, 3.5x the tiled walk; BASELINE.md)
            out.pop("feat", None)
        return out

    def _post(self, out, x):
        # postprocess in its OWN jit, not fused into the forward: unjitted
        # it pays the ~25 ms relay round-trip per jnp op (~25 ops), but
        # fused into the 220^3 L6 forward graph the remote compile blows
        # past 16 minutes (measured) vs ~300 s for the forward alone —
        # two dispatches per served volume is the right trade
        return postprocess(out, self.cfg, samples={"input": x})

    def evaluate_image(self, inputs, feature_only: bool = False,
                       run_postprocess: bool = True, keep_feat: bool = True):
        """inputs: (B, D, H, W, 1) or (D, H, W). (parity:
        test_utils.py:290-312).

        keep_feat=False omits the decoder feature maps from the result —
        the HBM headroom that makes whole-volume 220^3 flagship inference
        fit a single chip (serving and bench use this)."""
        keep_feat = keep_feat or feature_only
        x = jnp.asarray(inputs)
        if x.ndim == 3:
            x = x[None, ..., None]
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # spatial mesh: shard the volume's D axis; a data-only mesh
            # (the batched-serving configuration) replicates the single
            # volume instead of refusing to serve it
            has_space = dict(self.mesh.shape).get("space", 1) > 1
            spec = P(None, "space") if has_space else P()
            x = jax.device_put(x, NamedSharding(self.mesh, spec))
            self._replicate_params_on_mesh()
        do_post = run_postprocess and not feature_only
        import contextlib

        ctx = (jax.sharding.set_mesh(self.mesh) if self.mesh is not None
               else contextlib.nullcontext())
        with ctx:
            out = self._jitted(self.params, x, keep_feat=keep_feat)
            if do_post:
                out = self._jitted_post(out, x)
        if feature_only:
            return out["feat"][-1]
        return out

    def _replicate_params_on_mesh(self):
        if not getattr(self, "_params_replicated", False):
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.params = jax.tree.map(
                lambda a: jax.device_put(
                    a, NamedSharding(self.mesh, P())), self.params)
            self._params_replicated = True

    def evaluate_batch(self, vols, run_postprocess: bool = True,
                       keep_feat: bool = False):
        """B same-shape whole volumes in ONE dispatch. With a mesh carrying
        a 'data' axis the batch runs one-volume-per-data-rank (depth
        additionally sharded over 'space' when present) — serving
        throughput scales linearly with chips, the inference analog of DP
        training. B must be a multiple of the data-axis size. The
        reference serves strictly one volume at a time
        (evaluate_path, /root/reference/utils/test_utils.py:354-405).
        keep_feat defaults False (serving headroom, see evaluate_image)."""
        import contextlib

        x = jnp.asarray(vols)
        if x.ndim == 4:
            x = x[..., None]
        assert x.ndim == 5, f"expected (B,D,H,W[,1]), got {x.shape}"
        ctx = contextlib.nullcontext()
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shape = dict(self.mesh.shape)
            data = "data" if shape.get("data", 1) > 1 else None
            space = "space" if shape.get("space", 1) > 1 else None
            if data and x.shape[0] % shape["data"] != 0:
                raise ValueError(
                    f"batch of {x.shape[0]} volumes cannot shard over the "
                    f"mesh 'data' axis of size {shape['data']} — pass a "
                    f"multiple (evaluate_path pads its groups for you)")
            x = jax.device_put(x, NamedSharding(self.mesh, P(data, space)))
            self._replicate_params_on_mesh()
            ctx = jax.sharding.set_mesh(self.mesh)
        with ctx:
            out = self._jitted(self.params, x, keep_feat=keep_feat)
            if run_postprocess:
                out = self._jitted_post(out, x)
        return out

    def evaluate_tiled(self, vol, stride=(80, 80, 80),
                       win_size=(160, 160, 160), run_postprocess: bool = True,
                       fused: bool = True, accum_dtype=jnp.float32):
        """Whole-volume via tiles + overlap blending (parity:
        demo_test.test_tile, scripts/demo_test.py:66-119). `fused` runs the
        whole pass as one jitted scan (one dispatch instead of one per tile
        per output — see tiles.tiled_apply_fused).

        accum_dtype: fp32 default = reference-parity blending (the
        reference accumulates and count-averages in fp32,
        demo_test.py:106-119); pass bf16 as an opt-in speed mode (~0.4%
        blend error on overlap seams)."""

        def apply_fn(params, tile):
            with self._precision_ctx():
                out = self.model.apply(params, tile)
                out = apply_processors(out, self.cfg)
            return {k: v for k, v in out.items() if k != "feat"}

        vol = jnp.asarray(vol)
        if fused:
            from .tiles import make_tiled_fused

            key = (vol.shape, tuple(stride), tuple(win_size),
                   str(accum_dtype))
            if not hasattr(self, "_tiled_cache"):
                self._tiled_cache = {}
            if key not in self._tiled_cache:
                self._tiled_cache[key] = make_tiled_fused(
                    apply_fn, self.params, vol.shape, vol.dtype, stride,
                    win_size, accum_dtype)
            fn, offs = self._tiled_cache[key]
            outs = fn(self.params, vol, offs)
        else:
            outs = tiled_apply(apply_fn, self.params, vol, stride, win_size)
        if run_postprocess:
            # same jitted postprocess as evaluate_image — eager it pays
            # the ~25 ms relay round-trip per jnp op (~25 ops) on every
            # served volume (see _post)
            outs = {k: v[None] for k, v in outs.items()}
            outs = self._jitted_post(outs, jnp.asarray(vol)[None, ..., None])
            outs = {k: (v[0] if hasattr(v, "ndim") and v.ndim >= 4 else v)
                    for k, v in outs.items()}
        return outs

    def get_feature(self, img_path_or_vol, win_size=None):
        """64-channel feature extraction (parity:
        scripts/demo_get_feature.py:27-44)."""
        if isinstance(img_path_or_vol, str):
            im, _, _, _ = prepare_image(img_path_or_vol, win_size)
        else:
            im = jnp.asarray(img_path_or_vol)
        return self.evaluate_image(im, feature_only=True)

    def _fetch_outputs(self, outs, exclude_keys):
        """One batched pytree device->host transfer (device buffers free as
        soon as it lands) — the per-array serial transfer loop was the
        serving wall-clock bottleneck."""
        sel = {k: v for k, v in outs.items()
               if k not in exclude_keys and k != "feat"}
        return jax.device_get(sel)

    def _out_dir(self, save_dir, path):
        """Per-input output directory: save_dir/<basename without .nii*>.
        Single definition — the serial and batched pipelines must write
        the same input to the same place."""
        return os.path.join(save_dir, os.path.basename(path).split(".nii")[0])

    def _write_outputs(self, host, aff, out_dir, ext):
        """gz-encode host arrays to NIfTI on a small thread pool."""
        from concurrent.futures import ThreadPoolExecutor

        def _write_one(item):
            key, val = item
            arr = np.asarray(val)[0]
            arr = np.clip(arr, 0.0, None) if key not in (
                "regx", "regy", "regz") else arr
            viewVolume(arr.squeeze(), aff, names=[f"out_{key}"], ext=ext,
                       save_dir=out_dir)

        with ThreadPoolExecutor(max_workers=4) as ex:
            list(ex.map(_write_one, host.items()))

    def evaluate_path(self, input_paths, save_dir, win_size=(220, 220, 220),
                      exclude_keys=(), ext=".nii.gz", save_input=False,
                      prefetch: bool = True, batch_size: int = 1):
        """Batch file evaluation with NIfTI dumps (parity:
        test_utils.py:354-405).

        `batch_size` > 1 serves volume GROUPS through evaluate_batch —
        one whole volume per mesh data-rank per dispatch (an Inferencer
        mesh with a 'data' axis is what makes the HBM math work).
        Volumes whose post-prepare shapes differ (files smaller than
        win_size pass through center_crop uncropped) are bucketed by
        shape within each group and each bucket is batched separately —
        mixed-size inputs serve correctly, they just share fewer
        dispatches. Partial buckets are padded by repetition to the mesh
        data-axis multiple (or to the full batch_size when that
        executable is already compiled this run — on the remote-compile
        relay a fresh graph costs minutes, a duplicate forward ~0.6 s)
        and the extra outputs dropped. With `prefetch` (default), decode
        of group n+1 and NIfTI writes of group n-1 overlap compute of
        group n, same as the single-volume pipeline; prefetch=False runs
        load -> compute -> write strictly serially (group members still
        decode on parallel threads).

        Serving throughput: with `prefetch` (default) the pipeline is
        double-buffered — volume n+1 decodes/resamples on a host thread
        while the device computes volume n (dispatch is async), and the
        NIfTI gz-encode/writes of volume n run on a writer thread while
        n+1 computes. The device->host transfer of volume n stays on the
        MAIN thread, before n+1 is dispatched: only one volume's output
        set is ever device-resident (two co-resident ~70-channel 220^3
        output sets would push the L6 flagship past single-chip HBM — the
        same headroom keep_feat=False buys). Identical outputs to the
        serial path; a failure in any stage (decode, forward, write)
        raises — including a writer-thread failure racing a decode error."""
        input_paths = list(input_paths)
        results = []
        if batch_size > 1 and input_paths:
            return self._evaluate_path_batched(
                input_paths, save_dir, win_size, exclude_keys, ext,
                save_input, batch_size, prefetch)
        if not prefetch or len(input_paths) <= 1:
            for p in input_paths:
                im, aff, _, _ = prepare_image(p, list(win_size))
                out_dir = self._out_dir(save_dir, p)
                os.makedirs(out_dir, exist_ok=True)
                if save_input:
                    viewVolume(np.asarray(im), aff, names=["input"], ext=ext,
                               save_dir=out_dir)
                outs = self.evaluate_image(im, keep_feat=False)
                host = self._fetch_outputs(outs, exclude_keys)
                self._write_outputs(host, aff, out_dir, ext)
                results.append(out_dir)
            return results

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as ex:
            load = ex.submit(prepare_image, input_paths[0], list(win_size))
            write = None
            try:
                for i, p in enumerate(input_paths):
                    im, aff, _, _ = load.result()
                    if i + 1 < len(input_paths):
                        load = ex.submit(prepare_image, input_paths[i + 1],
                                         list(win_size))
                    out_dir = self._out_dir(save_dir, p)
                    os.makedirs(out_dir, exist_ok=True)
                    if save_input:
                        viewVolume(np.asarray(im), aff, names=["input"],
                                   ext=ext, save_dir=out_dir)
                    outs = self.evaluate_image(im, keep_feat=False)  # async
                    # blocks until compute(n)+transfer done; write(n-1)
                    # overlaps on the writer thread, decode(n+1) on the
                    # loader thread
                    host = self._fetch_outputs(outs, exclude_keys)
                    if write is not None:
                        write.result()
                    write = ex.submit(self._write_outputs, host, aff,
                                      out_dir, ext)
                    results.append(out_dir)
            finally:
                # always surface the pending write's outcome — without this
                # a writer failure is silently discarded when a later
                # decode/forward raises first (the write error chains as
                # __context__ if both fail)
                if write is not None:
                    write.result()
        return results

    def _evaluate_path_batched(self, input_paths, save_dir, win_size,
                               exclude_keys, ext, save_input, batch_size,
                               prefetch=True):
        """Group-batched serving pipeline (see evaluate_path batch_size)."""
        from concurrent.futures import ThreadPoolExecutor

        data_n = 1
        if self.mesh is not None:
            data_n = dict(self.mesh.shape).get("data", 1)

        groups = [input_paths[i:i + batch_size]
                  for i in range(0, len(input_paths), batch_size)]
        # shapes already run at B=batch_size this call: a partial bucket
        # of such a shape pads up to batch_size to REUSE the compiled
        # executable instead of compiling a fresh smaller-B graph
        compiled_full = set()

        def compute_group(g, loaded):
            """Bucket the group's volumes by shape (center_crop passes
            volumes smaller than win_size through uncropped, so shapes
            can differ), run one batched dispatch per bucket, and return
            per-input host outputs in input order. Buckets run strictly
            sequentially so only ONE output set is ever device-resident
            (the single-chip HBM headroom, see evaluate_path)."""
            buckets: dict = {}
            for pos, (im, aff, _, _) in enumerate(loaded):
                buckets.setdefault(tuple(im.shape), []).append((pos, im))
            out_host = [None] * len(g)
            # the B a full group actually dispatches at: batch_size rounded
            # up to the mesh data-axis multiple (evaluate_batch requires
            # divisibility; reuse must pad to the COMPILED B, not to a
            # batch_size that may violate it)
            full_B = -(-batch_size // data_n) * data_n
            for shp, members in buckets.items():
                vols = [im for _, im in members]
                n_real = len(vols)
                pad_to = -(-n_real // data_n) * data_n
                if n_real == batch_size:
                    compiled_full.add(shp)
                    pad_to = full_B
                elif shp in compiled_full:
                    pad_to = full_B
                if pad_to > n_real:
                    # partial tail bucket: padded dispatch recomputes the
                    # last volume pad_to-n_real extra times (compile reuse
                    # beats a fresh smaller-B graph) — say so, don't let a
                    # 1-volume tail on an 8-rank mesh look free
                    print(f"evaluate_path: padding {n_real} volume(s) of "
                          f"shape {shp} to a batch of {pad_to} "
                          f"({pad_to - n_real} redundant recompute(s); "
                          "reusing the compiled executable)")
                while len(vols) < pad_to:
                    vols.append(vols[-1])
                x = jnp.stack([jnp.asarray(v) for v in vols])[..., None]
                outs = self.evaluate_batch(x)  # async dispatch
                host = self._fetch_outputs(outs, exclude_keys)
                for i, (pos, _) in enumerate(members):
                    out_host[pos] = {k: v[i:i + 1] for k, v in host.items()}
            return out_host

        def write_group(host_list, g, affs):
            for p, aff, one in zip(g, affs, host_list):
                out_dir = self._out_dir(save_dir, p)
                os.makedirs(out_dir, exist_ok=True)
                self._write_outputs(one, aff, out_dir, ext)

        def save_inputs(g, loaded):
            for p, (im, aff, _, _) in zip(g, loaded):
                out_dir = self._out_dir(save_dir, p)
                os.makedirs(out_dir, exist_ok=True)
                viewVolume(np.asarray(im), aff, names=["input"], ext=ext,
                           save_dir=out_dir)

        results = []
        # decode pool: one worker per group member; wr carries the group
        # loader AND the (at most one in-flight) group write concurrently
        with ThreadPoolExecutor(max_workers=batch_size) as dec, \
                ThreadPoolExecutor(max_workers=2) as wr:

            def load_group(g):
                return list(dec.map(
                    lambda p: prepare_image(p, list(win_size)), g))

            if not prefetch:
                # strictly serial: load -> compute -> write, one group at
                # a time; bounds host memory to a single decoded group
                for g in groups:
                    loaded = load_group(g)
                    if save_input:
                        save_inputs(g, loaded)
                    affs = [aff for _, aff, _, _ in loaded]
                    write_group(compute_group(g, loaded), g, affs)
                    results.extend(self._out_dir(save_dir, p) for p in g)
                return results

            # the group loader runs on the WRITER pool (not dec): a
            # dec.map scheduled from inside a dec worker would deadlock
            # when all dec workers are busy
            load = wr.submit(load_group, groups[0])
            write = None
            try:
                for gi, g in enumerate(groups):
                    loaded = load.result()
                    if gi + 1 < len(groups):
                        load = wr.submit(load_group, groups[gi + 1])
                    if save_input:
                        save_inputs(g, loaded)
                    affs = [aff for _, aff, _, _ in loaded]
                    host_list = compute_group(g, loaded)
                    if write is not None:
                        write.result()
                    write = wr.submit(write_group, host_list, g, affs)
                    results.extend(self._out_dir(save_dir, p) for p in g)
            finally:
                # always surface the pending write's outcome (see the
                # single-volume pipeline above)
                if write is not None:
                    write.result()
        return results


class TwoStageInferencer:
    """Two-stage inpainting inference (parity: evaluate_image_twostage,
    utils/test_utils.py:316-350): stage-0 pathology mask, stage-1 masked
    conditioned prediction — both jitted once."""

    def __init__(self, cfg: AttrDict, pathol_ckpt=None, task_ckpt=None,
                 compute_dtype=jnp.float32):
        from ..models.build import build_inpaint_model, twostage_forward

        self.cfg, self.pathol_model, self.task_model = build_inpaint_model(
            cfg, compute_dtype=compute_dtype)
        size = tuple(self.cfg.generator.size)
        x = jnp.zeros((1, *size, 1), jnp.float32)

        orbax_cache: dict = {}

        def orbax_params(path):
            # this repo's twostage checkpoints are ONE orbax TrainState
            # with params = {'pathol': ..., 'task': ...} (scripts/train.py
            # trains both stages under one optimizer); accept the ckp/
            # root or a concrete ckpt_* directory, like Inferencer
            from ..train.checkpoint import latest_checkpoint

            p = path
            if os.path.isdir(path) and not os.path.basename(
                    path).startswith("ckpt_"):
                p = latest_checkpoint(path)
            if not p or not os.path.isdir(p):
                raise FileNotFoundError(f"no checkpoint found under {path}")
            p = os.path.abspath(p)
            if p not in orbax_cache:
                import orbax.checkpoint as ocp

                restored = ocp.StandardCheckpointer().restore(p)
                orbax_cache[p] = restored.get("params", restored)
            return orbax_cache[p]

        def load(model, ckpt, x0, stage):
            if ckpt and str(ckpt).endswith((".pth", ".pt")):
                from ..models.torch_import import import_checkpoint

                return import_checkpoint(str(ckpt))
            if ckpt:  # orbax directory (silently serving random weights
                # from an unrecognized checkpoint is never acceptable:
                # orbax_params raises if nothing restorable is there)
                tree = orbax_params(str(ckpt))
                sub = tree.get(stage, tree)
                return sub if "params" in sub else {"params": sub}
            return jax.jit(model.init)(jax.random.PRNGKey(0), x0)

        self.pathol_params = load(self.pathol_model, pathol_ckpt, x,
                                  "pathol")
        self.task_params = load(self.task_model, task_ckpt,
                                jnp.concatenate([x, x], -1), "task")

        def fwd(pp, tp, x):
            out = twostage_forward(self.pathol_model, self.task_model, pp, tp,
                                   x, self.cfg)
            # stage-0 pathology is already sigmoided by twostage_forward;
            # apply_processors would sigmoid it AGAIN (compressing served
            # masks into [0.5, 0.73]) — same guard as step.py/loop.py
            pathol = out.get("pathology")
            out = apply_processors(out, self.cfg)
            if pathol is not None:
                out["pathology"] = pathol
            return out

        self._jitted = jax.jit(fwd)

    def evaluate_image(self, inputs, feature_only: bool = False):
        x = jnp.asarray(inputs)
        if x.ndim == 3:
            x = x[None, ..., None]
        out = self._jitted(self.pathol_params, self.task_params, x)
        if feature_only:
            return out["feat_pathol"][-1], out["feat_task"][-1]
        return postprocess(out, self.cfg, samples={"input": x})


_ATLAS = {}

# The deformed-atlas source (reference ships it as files/gca.mgz). This is
# the read-only reference fixture — the ONE runtime data dependency on the
# reference tree — kept as the documented fallback because it is data, not
# code. Override order: explicit atlas_path arg > cfg key `atlas_path`
# (any cfgs/ YAML; see cfgs/trainer/default_val.yaml) > BRAINFM_ATLAS_PATH
# env var > this fallback.
DEFAULT_ATLAS_PATH = "/root/reference/files/gca.mgz"


def default_atlas_path(cfg=None) -> str:
    """Resolve the atlas path from cfg/env (see DEFAULT_ATLAS_PATH)."""
    p = getattr(cfg, "atlas_path", None) if cfg is not None else None
    return p or os.environ.get("BRAINFM_ATLAS_PATH") or DEFAULT_ATLAS_PATH


def get_deformed_atlas(brain_labels, regx, regy, regz,
                       atlas_path: str | None = None):
    """Warp the MNI atlas through predicted registration coordinates
    (parity: test_utils.py:45-57)."""
    atlas_path = atlas_path or default_atlas_path()
    if atlas_path not in _ATLAS:
        mni, aff2 = MRIread(atlas_path)
        _ATLAS[atlas_path] = (jnp.asarray(mni),
                              jnp.asarray(np.linalg.inv(aff2), jnp.float32))
    mni, A = _ATLAS[atlas_path]
    m = brain_labels > 0
    xx = 100.0 * regx
    yy = 100.0 * regy
    zz = 100.0 * regz
    ii = A[0, 0] * xx + A[0, 1] * yy + A[0, 2] * zz + A[0, 3]
    jj = A[1, 0] * xx + A[1, 1] * yy + A[1, 2] * zz + A[1, 3]
    kk = A[2, 0] * xx + A[2, 1] * yy + A[2, 2] * zz + A[2, 3]
    vals = trilinear3d(mni, ii, jj, kk)
    return jnp.where(m, vals, 0.0)
