"""Extract the standard 256-pair learned BRIEF sampling pattern.

The table is OpenCV's public `bit_pattern_31_` constant (the ORB paper's
learned pattern, shipped identically in opencv/modules/features2d/src/orb.cpp
and in the reference's src/orb_pattern.cpp). This script parses the integer
table from the reference copy and stores it as an (256, 4) int32 npy of
(x1, y1, x2, y2) offsets in a 31x31 patch.
"""
import re
import numpy as np

src = open("/root/reference/src/orb_pattern.cpp").read()
body = re.sub(r"/\*.*?\*/", "", src.split("=", 1)[1], flags=re.S)
nums = [int(n) for n in re.findall(r"-?\d+", body)]
arr = np.array(nums, dtype=np.int32)
assert arr.size == 256 * 4, arr.size
arr = arr.reshape(256, 4)
assert np.abs(arr).max() <= 15  # fits the 31x31 patch
np.save("/root/repo/vo_tpu/ops/brief_pattern.npy", arr)
print("wrote", arr.shape, "max abs", np.abs(arr).max())
