"""Scalar numpy oracles for the detector stack.

Slow, loop-based reference implementations of FAST/NMS/orientation/BRIEF
with the reference repo's semantics (bug-fixed where SURVEY.md §2c flags
bugs). These play the role the reference's orb_cpu.cpp / orb.py play for its
CUDA kernels: an independently-written scalar ground truth.
"""

import numpy as np

CIRCLE = [
    (0, -3), (1, -3), (2, -2), (3, -1),
    (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1),
    (-3, 0), (-3, -1), (-2, -2), (-1, -3),
]


def fast_score_oracle(img, threshold=20.0, n=9):
    H, W = img.shape
    out = np.zeros((H, W), dtype=np.float32)
    for y in range(3, H - 3):
        for x in range(3, W - 3):
            ip = float(img[y, x])
            circ = [float(img[y + oy, x + ox]) for ox, oy in CIRCLE]
            nb = sum(circ[i] >= ip + threshold for i in (0, 4, 8, 12))
            nd = sum(circ[i] <= ip - threshold for i in (0, 4, 8, 12))
            if max(nb, nd) < 3:
                continue
            is_corner = False
            for start in range(16):
                if all(circ[(start + k) % 16] >= ip + threshold for k in range(n)):
                    is_corner = True
                    break
                if all(circ[(start + k) % 16] <= ip - threshold for k in range(n)):
                    is_corner = True
                    break
            if is_corner:
                out[y, x] = sum(abs(ip - c) for c in circ)
    return out


def nms_oracle(score, radius=1, threshold=0.0):
    H, W = score.shape
    keep = np.zeros((H, W), dtype=bool)
    for y in range(radius, H - radius):
        for x in range(radius, W - radius):
            v = score[y, x]
            if v <= threshold:
                continue
            window = score[y - radius : y + radius + 1, x - radius : x + radius + 1]
            if (window > v).any():
                continue
            keep[y, x] = True
    return keep


def orientation_oracle(img, y, x, patch_size=31):
    H, W = img.shape
    r = patch_size // 2
    if x < r or x >= W - r or y < r or y >= H - r:
        return 0.0
    m10 = m01 = 0.0
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            I = float(img[y + dy, x + dx])
            m10 += dx * I
            m01 += dy * I
    return float(np.arctan2(m01, m10))


def brief_bits_oracle(img, y, x, angle, pattern):
    """256 bits using the correct full-window OOB bound and 5x5 box sums."""
    H, W = img.shape
    c, s = np.cos(angle), np.sin(angle)
    bits = np.zeros(256, dtype=np.uint8)

    def smooth(cy, cx):
        return img[cy - 2 : cy + 3, cx - 2 : cx + 3].astype(np.float64).sum()

    for i, (x1, y1, x2, y2) in enumerate(pattern):
        # round-half-to-even like __float2int_rn
        dx1, dy1 = np.rint(c * x1 - s * y1), np.rint(s * x1 + c * y1)
        dx2, dy2 = np.rint(c * x2 - s * y2), np.rint(s * x2 + c * y2)
        cx1, cy1 = int(x + dx1), int(y + dy1)
        cx2, cy2 = int(x + dx2), int(y + dy2)
        oob = False
        for cx, cy in ((cx1, cy1), (cx2, cy2)):
            if cx < 2 or cx > W - 3 or cy < 2 or cy > H - 3:
                oob = True
        if oob:
            continue
        if smooth(cy1, cx1) < smooth(cy2, cx2):
            bits[i] = 1
    return bits
