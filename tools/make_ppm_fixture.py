#!/usr/bin/env python3
"""Write the committed PPM (P6) fixture image: a deterministic 8x6 RGB
gradient with a header comment (exercising the format's comment rule).
Re-running produces a byte-identical file."""
import os

W, H = 8, 6
out = os.path.join(os.path.dirname(__file__), "..", "data", "gradient.ppm")
px = bytearray()
for y in range(H):
    for x in range(W):
        px += bytes(((x * 255) // (W - 1), (y * 255) // (H - 1),
                     ((x + y) * 7) % 256))
with open(out, "wb") as f:
    f.write(b"P6\n# graft fixture gradient\n%d %d\n255\n" % (W, H))
    f.write(bytes(px))
means = [sum(px[c::3]) / (W * H) for c in range(3)]
print(f"wrote gradient.ppm {W}x{H}, channel means {means}")
