"""KITTI odometry dataset IO.

Same on-disk semantics as the reference's per-driver loaders
(feature_matching.cpp:127-153): poses are 12 whitespace-separated floats per
line forming the top 3 rows of a 4x4 cam->world matrix; calib's first line is
`P0: <12 floats>` giving the 3x4 projection P, with K = P[:, :3]; images are
the sorted listing of `sequences/<seq>/image_0/*.png` (grayscale left cam).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


def read_poses(pose_file: str, max_frames: int | None = None) -> np.ndarray:
    """Load (N, 4, 4) cam->world poses from a KITTI poses txt file."""
    rows = np.loadtxt(pose_file, dtype=np.float64)
    if max_frames is not None:
        rows = rows[:max_frames]
    n = rows.shape[0]
    poses = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    poses[:, :3, :] = rows.reshape(n, 3, 4)
    return poses


def read_calib(calib_file: str, camera: str = "P0") -> tuple[np.ndarray, np.ndarray]:
    """Return (P 3x4, K 3x3) for the requested camera entry."""
    with open(calib_file) as f:
        for line in f:
            tag, _, rest = line.partition(":")
            if tag.strip() == camera:
                P = np.fromstring(rest, sep=" ", dtype=np.float64).reshape(3, 4)
                return P, P[:, :3].copy()
    raise KeyError(f"{camera} not found in {calib_file}")


def list_images(image_dir: str, max_frames: int | None = None) -> list[str]:
    names = sorted(
        n for n in os.listdir(image_dir) if n.lower().endswith((".png", ".pgm", ".jpg"))
    )
    if max_frames is not None:
        names = names[:max_frames]
    return [os.path.join(image_dir, n) for n in names]


def load_gray(path: str) -> np.ndarray:
    """Load a grayscale image as float32 (H, W) in [0, 255].

    Prefers the native C++ PNG decoder (vo_tpu/runtime/native; bit-exact
    vs PIL for 8-bit PNGs); falls back to PIL for other formats or when
    the toolchain is unavailable."""
    if path.lower().endswith(".png"):
        try:
            from ..runtime.loader import decode_png, native_available

            if native_available():
                return decode_png(path)
        except Exception:
            pass
    from PIL import Image

    img = Image.open(path)
    if img.mode != "L":
        img = img.convert("L")
    return np.asarray(img, dtype=np.float32)


@dataclass
class KittiSequence:
    """A KITTI odometry sequence: image paths, GT poses, intrinsics."""

    image_paths: list[str]
    poses: np.ndarray  # (N, 4, 4) cam->world
    K: np.ndarray  # (3, 3)
    P: np.ndarray  # (3, 4)

    @classmethod
    def open(
        cls, kitti_dir: str, sequence: str = "05", max_frames: int | None = 1000
    ) -> "KittiSequence":
        seq_dir = os.path.join(kitti_dir, "sequences", sequence)
        image_paths = list_images(os.path.join(seq_dir, "image_0"), max_frames)
        poses = read_poses(
            os.path.join(kitti_dir, "poses", f"{sequence}.txt"), max_frames
        )
        P, K = read_calib(os.path.join(seq_dir, "calib.txt"))
        n = min(len(image_paths), len(poses))
        return cls(image_paths=image_paths[:n], poses=poses[:n], K=K, P=P)

    def __len__(self) -> int:
        return len(self.image_paths)

    def frame(self, i: int) -> np.ndarray:
        return load_gray(self.image_paths[i])

    def gt_path_xz(self) -> np.ndarray:
        """(N, 2) ground-truth x/z path, the reference's dump format."""
        return self.poses[:, [0, 2], 3]

    def prefetched(self, n_threads: int = 4, ring: int = 16):
        """Same sequence with background native decode (falls back to the
        synchronous loader when the native library is unavailable)."""
        try:
            from ..runtime.loader import NativePrefetcher, native_available

            if native_available():
                return PrefetchedSequence(
                    self, NativePrefetcher(self.image_paths, n_threads, ring)
                )
        except Exception:
            pass
        return self


@dataclass
class PrefetchedSequence:
    """KittiSequence view whose frame() is served by the native
    multi-threaded decoder (decode overlaps device compute)."""

    base: KittiSequence
    _prefetcher: object

    @property
    def poses(self) -> np.ndarray:
        return self.base.poses

    @property
    def K(self) -> np.ndarray:
        return self.base.K

    def __len__(self) -> int:
        return len(self.base)

    def frame(self, i: int) -> np.ndarray:
        return self._prefetcher.get(i)

    def gt_path_xz(self) -> np.ndarray:
        return self.base.gt_path_xz()

    def close(self):
        self._prefetcher.close()
