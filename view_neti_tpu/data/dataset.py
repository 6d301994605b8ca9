"""TextualInversionDataset: host-side example generation.

Behavioral parity with /root/reference/training/dataset.py:39-739, rebuilt on
numpy/PIL with explicit RNG. Emits fixed-shape numpy examples ready for
device_put (NHWC float32 pixels in [-1, 1], int32 token ids).

Modes (captions; reference training/dataset.py:61-80, 634-681):
  0: "a photo of a <object>" (random IMAGENET template)
  1: "<view_x>. A photo of a {fixed_object}" (+ caption_strategy 1/2)
  2/4/5: "<view_x>. A photo of a <object>"
  3: "<view_x>. A photo of a <object_y>" with per-accumulation scene sampling
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np
from PIL import Image, ImageOps

from view_neti_tpu.constants import IMAGENET_TEMPLATES_SMALL
from view_neti_tpu.data import dtu as dtu_mod
from view_neti_tpu.data.augment import (apply_augmentations,
                                        build_augmentations)
from view_neti_tpu.utils.misc import filter_paths_imgs

_PIL_INTERP = {
    "linear": Image.Resampling.BILINEAR,
    "bilinear": Image.Resampling.BILINEAR,
    "bicubic": Image.Resampling.BICUBIC,
    "lanczos": Image.Resampling.LANCZOS,
    "nearest": Image.Resampling.NEAREST,
}


def _resize(image: Image.Image, size_wh, interpolation) -> Image.Image:
    """Resize via the native C++ library when built (2x faster on the
    1-core TPU VM host, PIL-matching antialiased kernels), else PIL."""
    import os
    if not os.environ.get("VIEW_NETI_NO_NATIVE"):
        from view_neti_tpu.data import native
        if native.available() and interpolation in (
                Image.Resampling.BICUBIC, Image.Resampling.BILINEAR):
            mode = ("bicubic" if interpolation == Image.Resampling.BICUBIC
                    else "bilinear")
            arr = native.resize(np.asarray(image.convert("RGB")),
                                size_wh[1], size_wh[0], mode)
            return Image.fromarray(arr)
    return image.resize(size_wh, resample=interpolation)


class TextualInversionDataset:
    def __init__(self,
                 data_root: Union[str, Path],
                 tokenizer,
                 camera_representation: str,
                 learnable_mode: int,
                 train_data_subsets: Optional[Sequence[Path]] = None,
                 placeholder_object_tokens: Optional[List[str]] = None,
                 fixed_object_token_or_path: Optional[str] = None,
                 size: int = 768,
                 repeats: int = 100,
                 interpolation: str = "bicubic",
                 flip_p: float = 0.0,
                 set_name: str = "train",
                 placeholder_object_token: str = "*",
                 dtu_lighting: str = "3",
                 dtu_subset: int = 0,
                 caption_strategy: int = 0,
                 dtu_preprocess_key: int = 0,
                 augmentation_key: int = 0,
                 center_crop: bool = False,
                 calibration_dir: Optional[str] = None,
                 seed: int = 0):
        self.learnable_mode = learnable_mode
        self.data_root = Path(data_root)
        self.tokenizer = tokenizer
        self.size = size
        self.placeholder_object_token = placeholder_object_token
        self.center_crop = center_crop
        self.flip_p = flip_p if learnable_mode == 0 else 0.0
        self.train_data_subsets = ([str(s) for s in train_data_subsets]
                                   if train_data_subsets else None)
        self.camera_representation = camera_representation
        self.dtu_lighting = str(dtu_lighting)
        self.dtu_subset = dtu_subset
        self.dtu_preprocess_key = dtu_preprocess_key
        self.caption_strategy = caption_strategy
        self.calibration_dir = calibration_dir
        self.seed = seed
        # shared sequential generator: FALLBACK ONLY for direct
        # _augment_normalize/_process_image callers — the train path
        # always passes a counter-derived per-example generator (see
        # __getitem__; CLAUDE.md resume-exactness invariant)
        self.rng = np.random.default_rng(seed)
        # counter-based determinism (r3): every stochastic draw is keyed by
        # (seed, epoch, example index) or an explicit batch counter instead
        # of consuming a shared sequential RNG — so a resumed run replays
        # the EXACT stochastic stream of the uninterrupted run (the TPU
        # idiom: derive randomness from counters, never from shared state)
        self._epoch = 0
        self._scene_counter = 0
        self.interpolation = _PIL_INTERP[interpolation]
        self.templates = IMAGENET_TEMPLATES_SMALL

        if self.caption_strategy > 0:
            assert learnable_mode == 1, \
                "alt caption_strategy only implemented for mode 1"

        # ---- image paths ---------------------------------------------------
        if learnable_mode != 3:
            paths = filter_paths_imgs(sorted(self.data_root.glob("*")))
            if (self.camera_representation == "dtu-12d"
                    and learnable_mode != 0):
                paths = dtu_mod.dtu_filter_fnames_lighting(
                    paths, self.dtu_lighting)
                idxs = dtu_mod.dtu_get_train_idxs(dtu_subset)
                paths = dtu_mod.dtu_filter_image_paths_from_idx(paths, idxs)
            self.image_paths = paths
            self.image_paths_flattened = paths
            self.num_images = len(paths)
        else:
            self.image_paths = {}
            for subdir in self.train_data_subsets:
                paths = filter_paths_imgs(
                    sorted((self.data_root / subdir).glob("*")))
                if self.camera_representation == "dtu-12d":
                    paths = dtu_mod.dtu_filter_fnames_lighting(
                        paths, self.dtu_lighting)
                    idxs = dtu_mod.dtu_get_train_idxs(dtu_subset)
                    paths = dtu_mod.dtu_filter_image_paths_from_idx(
                        paths, idxs)
                assert len(paths) > 0, f"no images in subset {subdir}"
                self.image_paths[subdir] = paths
            self.image_paths_flattened = [
                p for row in self.image_paths.values() for p in row]
            self.num_images = len(self.image_paths_flattened)
            # global (flattened) index offset per subset, so image_idx can
            # address caches built over image_paths_flattened
            self._subset_offsets = {}
            off = 0
            for subdir, row in self.image_paths.items():
                self._subset_offsets[subdir] = off
                off += len(row)
            self.reset_sampled_object()

        assert self.num_images > 0, \
            "no images found; check data.train_data_dir"
        self._length = self.num_images * (repeats if set_name == "train"
                                          else 1)

        # decoded-base cache: the decode + deterministic-resize prefix of
        # _process_image is identical every epoch (augmentations apply to
        # the resized image), so cache it as uint8 — on a 1-core TPU VM the
        # PNG decode otherwise dominates the augmented-config step.
        import os as _os
        self._tok_cache: Dict[str, np.ndarray] = {}
        self._base_cache: Dict[str, np.ndarray] = {}
        self._base_cache_limit = int(_os.environ.get(
            "VIEW_NETI_BASE_CACHE_MB", "512")) * 1_000_000
        self._base_cache_bytes = 0

        # ---- placeholder tokens --------------------------------------------
        self.fixed_object_token_pretrained = False
        if learnable_mode == 0:
            self.placeholder_object_tokens = [placeholder_object_token]
            self.placeholder_view_tokens: List[str] = []
            self.fixed_object_token = None
        elif learnable_mode in (1, 2, 3, 4, 5):
            if learnable_mode in (3, 4, 5):
                assert camera_representation == "dtu-12d", \
                    "modes 3/4/5 verified only on DTU"
            self.placeholder_view_tokens = self._generate_view_tokens()
            self.placeholder_view_tokens = self._order_view_tokens(
                self.placeholder_view_tokens)
            if (fixed_object_token_or_path is not None
                    and str(fixed_object_token_or_path).endswith(
                        (".pt", ".msgpack"))):
                # pretrained object mapper: placeholder token comes from cfg
                self.fixed_object_token_pretrained = True
                self.fixed_object_token = placeholder_object_token
                self.placeholder_object_tokens = [placeholder_object_token]
            elif learnable_mode == 1:
                self.fixed_object_token = fixed_object_token_or_path
                self.placeholder_object_tokens = []
            elif learnable_mode in (2, 4, 5):
                self.fixed_object_token = None
                self.placeholder_object_tokens = [placeholder_object_token]
            else:  # mode 3
                self.fixed_object_token = None
                self.placeholder_object_tokens = list(
                    placeholder_object_tokens)
                self.lookup_object_to_placeholder_object_token = {
                    str(s): t for s, t in zip(self.train_data_subsets,
                                              self.placeholder_object_tokens)}
        else:
            raise ValueError(f"learnable_mode {learnable_mode}")

        self.placeholder_tokens = (self.placeholder_view_tokens
                                   + self.placeholder_object_tokens)

        # ---- augmentations ---------------------------------------------------
        self.augmentation_key = augmentation_key
        self.augmentations = None
        if augmentation_key > 0:
            if learnable_mode == 0:
                aug_size = (self.size, self.size)
            elif dtu_preprocess_key == 0:
                aug_size = (512, 512)
            elif dtu_preprocess_key == 1:
                aug_size = (384, 512)   # (h, w)
            else:
                aug_size = (576, 768)
            self.augmentations = build_augmentations(augmentation_key,
                                                     aug_size)

    # ---- view-token generation (reference dataset.py:411-453) ------------
    def _generate_view_tokens(self) -> List[str]:
        if self.camera_representation == "spherical":
            prefixes = [Path(f).stem.split("___")[-1]
                        for f in self.image_paths]
            assert all(len(p.split("_")) == 3 for p in prefixes)
            return sorted(set(f"<view_{p}>" for p in prefixes))
        if self.camera_representation == "dtu-12d":
            kwargs = {}
            if self.calibration_dir is not None:
                kwargs["calibration_dir"] = self.calibration_dir
            (self.lookup_camidx_to_view_token,
             self.lookup_camidx_to_cam_params
             ) = dtu_mod.dtu_generate_dset_cam_tokens_params(**kwargs)
            self.lookup_view_token_to_camidx = {
                v: k for k, v in self.lookup_camidx_to_view_token.items()}
            paths = (self.image_paths if self.learnable_mode != 3
                     else self.image_paths_flattened)
            cam_idxs = sorted(set(
                dtu_mod.dtu_cam_info_from_fname(f)[0] for f in paths))
            return [self.lookup_camidx_to_view_token[k] for k in cam_idxs]
        raise NotImplementedError(self.camera_representation)

    def _order_view_tokens(self, tokens: List[str]) -> List[str]:
        """Order tokens for consistent validation sweeps (reference
        dataset.py:524-582)."""
        if self.camera_representation == "dtu-12d":
            keys = sorted(self.lookup_view_token_to_camidx[t] for t in tokens)
            return [self.lookup_camidx_to_view_token[k] for k in keys]
        # spherical: sort by phi when only phi varies; else keep order
        from view_neti_tpu.utils.codec import string_to_num
        params = np.asarray([[string_to_num(n) for n in t[6:-1].split("_")]
                             for t in tokens])
        n_uniques = [len(np.unique(params[:, i])) for i in range(3)]
        if n_uniques[0] == 1 and n_uniques[1] > 1 and n_uniques[2] == 1:
            order = np.argsort(params[:, 1])
            return [tokens[i] for i in order]
        return tokens

    # ---- mode-3 scene resampling (reference dataset.py:584-600) ------------
    def reset_sampled_object(self, counter: Optional[int] = None) -> None:
        """Resample the current scene. counter: explicit draw index (the
        DataLoader passes its global batch/group counter so the scene
        sequence is a pure function of (seed, counter) — resume-exact);
        None uses an internal monotonic counter (direct callers)."""
        assert self.learnable_mode == 3
        if counter is None:
            counter = self._scene_counter
            self._scene_counter += 1
        rng = np.random.default_rng((self.seed, 0x5CE4E, int(counter)))
        self.current_object_idx = int(
            rng.integers(len(self.train_data_subsets)))

    def set_epoch(self, epoch: int) -> None:
        """Epoch index mixed into per-example RNG (torch
        DistributedSampler.set_epoch idiom); called by the DataLoader."""
        self._epoch = int(epoch)

    def __len__(self) -> int:
        return self._length

    # when True, __getitem__ emits ids/captions only (no image decode) —
    # set by the Coach once the latent cache is filled
    skip_pixels: bool = False

    # when True, __getitem__ emits the cached uint8 base image (decode +
    # deterministic resize only); the stochastic flip/augment suffix runs
    # on device inside the train step (ops/device_augment.py). Set by the
    # Coach when device augmentation engages.
    emit_base_pixels: bool = False

    def _preprocess_branch(self) -> str:
        """Which deterministic-preprocess branch _base_image takes —
        single source of truth for uniform_base_shape (the reference keys
        this on data_root substrings, reference dataset.py:692-737; the
        precedence here matches _base_image exactly, so e.g. a path
        containing both 'dtu' and 'llff' resolves identically in both)."""
        root = str(self.data_root)
        if "dtu" in root:
            return "dtu"
        if "llff" in root:
            return "llff"
        return "square"

    @property
    def uniform_base_shape(self) -> bool:
        """True when every base image shares one static shape (required to
        batch uint8 bases for the on-device augmentation path). Only the
        llff passthrough (reference dataset.py:712-713) skips the
        deterministic resize."""
        return self._preprocess_branch() != "llff"

    # ---- example construction (reference dataset.py:605-739) --------------
    def __getitem__(self, i: int) -> Dict[str, Any]:
        if self.learnable_mode != 3:
            image_paths = self.image_paths
            placeholder_object_token = (self.placeholder_object_tokens[0]
                                        if self.placeholder_object_tokens
                                        else None)
            idx = i % self.num_images
        else:
            current = self.train_data_subsets[self.current_object_idx]
            image_paths = self.image_paths[current]
            placeholder_object_token = \
                self.lookup_object_to_placeholder_object_token[current]
            idx = i % len(image_paths)

        image_path = Path(image_paths[idx])
        # image_idx is GLOBAL over image_paths_flattened (mode 3 adds the
        # subset offset) so device-resident caches can be indexed by it
        global_idx = (idx if self.learnable_mode != 3
                      else self._subset_offsets[current] + idx)
        example: Dict[str, Any] = {"image_idx": global_idx}
        # all of this example's stochastic choices (template, flip, host
        # augmentations) derive from (seed, epoch, i): same distribution
        # as a shared sequential RNG, but a pure function of the example's
        # position in the schedule — resume replays the exact stream
        ex_rng = np.random.default_rng((self.seed, self._epoch, int(i)))
        template = self.templates[int(ex_rng.integers(len(self.templates)))]

        if self.learnable_mode == 0:
            example["text"] = template.format(placeholder_object_token)
            example["input_ids_placeholder_view"] = np.int32(-1)
            example["input_ids_placeholder_object"] = np.int32(
                self.tokenizer.convert_tokens_to_ids(
                    placeholder_object_token))
        else:
            if self.camera_representation == "spherical":
                view_token = f"<view_{image_path.stem.split('___')[-1]}>"
            else:
                cam_key, _ = dtu_mod.dtu_cam_info_from_fname(image_path)
                view_token = self.lookup_camidx_to_view_token[cam_key]
            assert view_token in self.placeholder_view_tokens

            if self.learnable_mode == 1:
                obj = self.fixed_object_token
                if self.caption_strategy == 0:
                    text = f"{view_token}. A photo of a {obj}"
                elif self.caption_strategy == 1:
                    text = f"A photo of a {obj} in the stye of {view_token}"
                elif self.caption_strategy == 2:
                    text = f"A photo of a {obj} {view_token}"
                else:
                    raise NotImplementedError(self.caption_strategy)
                if self.fixed_object_token_pretrained:
                    example["input_ids_placeholder_object"] = np.int32(
                        self.tokenizer.convert_tokens_to_ids(
                            placeholder_object_token))
                else:
                    example["input_ids_placeholder_object"] = np.int32(-1)
            else:
                text = (f"{view_token}. A photo of a "
                        f"{placeholder_object_token}")
                example["input_ids_placeholder_object"] = np.int32(
                    self.tokenizer.convert_tokens_to_ids(
                        placeholder_object_token))
            example["text"] = text
            example["input_ids_placeholder_view"] = np.int32(
                self.tokenizer.convert_tokens_to_ids(view_token))

        # captions come from a small closed set (templates x placeholder
        # tokens); cache tokenizations — BPE on the 1-core host otherwise
        # shows up in the steady-state step time
        ids = self._tok_cache.get(example["text"])
        if ids is None:
            ids = np.asarray(self.tokenizer(
                example["text"], padding="max_length", truncation=True,
                max_length=self.tokenizer.model_max_length).input_ids[0])
            ids.setflags(write=False)
            self._tok_cache[example["text"]] = ids
        example["input_ids"] = ids
        if self.learnable_mode == 3:
            example["object_idx"] = np.int32(self.current_object_idx)
        else:
            example["object_idx"] = np.int32(0)

        # With the latent cache active the trainer consumes image_idx only;
        # skip the decode+resize+augment entirely (the reference decodes
        # every image every step unconditionally, coach.py:167-169, and
        # round 1 still decoded pixels the cache path threw away).
        if not self.skip_pixels:
            if self.emit_base_pixels:
                example["pixel_values"] = self._load_base(image_path)
            else:
                example["pixel_values"] = self._load_pixels(image_path,
                                                            ex_rng)
        return example

    def _load_base(self, image_path: Path) -> np.ndarray:
        """uint8 decode + deterministic-resize base, cached per file."""
        key = str(image_path)
        base = self._base_cache.get(key)
        if base is None:
            image = Image.open(image_path)
            if image.mode != "RGB":
                image = image.convert("RGB")
            base = np.asarray(self._base_image(image), dtype=np.uint8)
            if self._base_cache_bytes + base.nbytes \
                    <= self._base_cache_limit:
                self._base_cache[key] = base
                self._base_cache_bytes += base.nbytes
        return base

    def _load_pixels(self, image_path: Path,
                     rng: Optional[np.random.Generator] = None
                     ) -> np.ndarray:
        """Decoded-base-cache front end of _process_image: the decode +
        deterministic resize is computed once per file, augmentations
        every draw."""
        base = self._load_base(image_path)
        return self._augment_normalize(Image.fromarray(base), rng)

    def _process_image(self, image: Image.Image,
                       rng: Optional[np.random.Generator] = None
                       ) -> np.ndarray:
        return self._augment_normalize(self._base_image(image), rng)

    def _base_image(self, image: Image.Image) -> Image.Image:
        """Deterministic preprocess: center crop + target resize
        (reference dataset.py:605-739 preprocess keys)."""
        img = np.array(image).astype(np.uint8)
        if self.center_crop:
            crop = min(img.shape[0], img.shape[1])
            h, w = img.shape[0], img.shape[1]
            img = img[(h - crop) // 2:(h + crop) // 2,
                      (w - crop) // 2:(w + crop) // 2]
        image = Image.fromarray(img)

        branch = self._preprocess_branch()
        if branch == "dtu":
            if self.dtu_preprocess_key == -1:
                # test-only miniature preprocessing (keeps the DTU 4:3
                # aspect); not part of the reference surface
                image = _resize(image, (64, 48), self.interpolation)
            elif self.dtu_preprocess_key == 0:
                image = ImageOps.expand(image, (0, 0, 0, 400), fill="black")
                assert image.size == (1600, 1600), image.size
                image = _resize(image, (512, 512), self.interpolation)
            elif self.dtu_preprocess_key == 1:
                image = _resize(image, (512, 384), self.interpolation)
            elif self.dtu_preprocess_key == 2:
                image = _resize(image, (768, 576), self.interpolation)
            else:
                raise NotImplementedError(self.dtu_preprocess_key)
        elif branch == "llff":
            pass
        else:
            image = _resize(image, (self.size, self.size),
                            self.interpolation)
        return image

    def _augment_normalize(self, image: Image.Image,
                           rng: Optional[np.random.Generator] = None
                           ) -> np.ndarray:
        """Stochastic suffix: flip + augmentation preset + [-1,1] scale.
        rng: per-example counter-derived generator (__getitem__); falls
        back to the shared sequential RNG for direct callers."""
        rng = rng if rng is not None else self.rng
        img_size = image.size
        if self.learnable_mode == 0 and rng.uniform() < self.flip_p:
            image = ImageOps.mirror(image)
        if self.augmentations is not None:
            image = apply_augmentations(image, self.augmentations, rng)
            assert image.size == img_size

        arr = np.asarray(image, dtype=np.uint8)
        arr = (arr / 127.5 - 1.0).astype(np.float32)
        return arr  # NHWC (the reference permutes to CHW for torch)


class DataLoader:
    """Minimal shuffling batcher with numpy collation.

    Replaces torch DataLoader (reference coach.py:704-725). Runs in-process:
    the TPU step dominates wall-clock and examples are small; heavy image
    decode can be pushed to the native C++ extension when present.
    """

    def __init__(self, dataset: TextualInversionDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True,
                 group_size: Optional[int] = None,
                 start_batch: int = 0):
        """group_size (mode-3 fused accumulation): assemble each batch as
        batch_size/group_size contiguous GROUPS, resampling the scene
        before each group — the reference's per-microbatch scene resample
        (reference dataset.py:584-600, coach.py:155-156) carried inside
        one fused device batch. The collated object_idx is then (G,).

        Deterministic schedule (r3): the epoch order is a pure function of
        (seed, epoch), mode-3 scene resamples are keyed by the GLOBAL
        batch/group counter, and per-example stochasticity is keyed by
        (seed, epoch, example index) inside the dataset — so the entire
        stochastic data stream is a function of the batch position.
        start_batch fast-forwards to that position on resume (the Coach
        passes global_step * accum_k)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.group_size = group_size
        if group_size:
            assert batch_size % group_size == 0, (batch_size, group_size)
        self.seed = seed
        self._next_batch = int(start_batch)

    @property
    def batches_per_epoch(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(n // -self.batch_size)

    def __iter__(self):
        """One epoch (or the remainder of one after a fast-forward)."""
        n = len(self.dataset)
        bpe = self.batches_per_epoch
        epoch = self._next_batch // max(bpe, 1)
        first = self._next_batch % max(bpe, 1)
        order = (np.random.default_rng((self.seed, epoch)).permutation(n)
                 if self.shuffle else np.arange(n))
        self.dataset.set_epoch(epoch)
        groups_per_batch = (self.batch_size // self.group_size
                            if self.group_size else 1)
        for b in range(first, bpe):
            start = b * self.batch_size
            idxs = order[start:start + self.batch_size]
            if self.group_size:
                examples = []
                for g, g0 in enumerate(
                        range(0, len(idxs), self.group_size)):
                    self.dataset.reset_sampled_object(
                        counter=self._next_batch * groups_per_batch + g)
                    examples.extend(
                        self.dataset[int(i)]
                        for i in idxs[g0:g0 + self.group_size])
            else:
                if self.dataset.learnable_mode == 3:
                    self.dataset.reset_sampled_object(
                        counter=self._next_batch)
                examples = [self.dataset[int(i)] for i in idxs]
            self._next_batch += 1
            yield self._collate(examples, self.group_size)

    @staticmethod
    def _collate(examples: List[Dict[str, Any]],
                 group_size: Optional[int] = None) -> Dict[str, np.ndarray]:
        batch = {}
        keys = ("input_ids", "input_ids_placeholder_object",
                "input_ids_placeholder_view")
        if "pixel_values" in examples[0]:
            keys = ("pixel_values",) + keys
        for k in keys:
            batch[k] = np.stack([e[k] for e in examples])
        if group_size:
            batch["object_idx"] = np.asarray(
                [examples[g]["object_idx"]
                 for g in range(0, len(examples), group_size)], np.int32)
        else:
            batch["object_idx"] = np.asarray(examples[0]["object_idx"])
        batch["image_idxs"] = np.asarray(
            [e["image_idx"] for e in examples], np.int32)
        batch["texts"] = [e["text"] for e in examples]
        return batch
