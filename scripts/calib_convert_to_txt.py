"""Convert a basalt calibration.json into a DSO/TANDEM camera.txt.

Parity: /root/reference/tandem/scripts/calib_convert_to_txt.py — reads the
basalt-calibrate output (``value0.intrinsics[0]`` with camera_type ``kb4``),
rescales the intrinsics from the capture resolution to the runtime
resolution with half-pixel-aware centers, and writes the 4-line DSO
``EquiDistant`` calib (consumed by data/undistort.py, Undistort.from_file).

Usage:
    python scripts/calib_convert_to_txt.py TANDEM_CALIB_DIR \
        [--in-size 1280x800] [--out-size 512x320]

The defaults match the reference's hardcoded capture (1280x800) and runtime
(512x320) sizes.
"""

import argparse
import json
import os


def _parse_size(s):
    w, h = s.lower().split("x")
    return int(w), int(h)


def convert(calib_dir, in_size=(1280, 800), out_size=(512, 320)):
    with open(os.path.join(calib_dir, "calibration.json")) as fp:
        d = json.load(fp)["value0"]
    cam = d["intrinsics"][0]
    assert cam["camera_type"] == "kb4", (
        f"expected a basalt kb4 calibration, got {cam['camera_type']}")
    intr = cam["intrinsics"]

    (w_in, h_in), (w, h) = in_size, out_size
    sx, sy = w / w_in, h / h_in
    # Half-pixel-aware center rescale (pixel centers at integer coords).
    fx, fy = intr["fx"] * sx, intr["fy"] * sy
    cx = (intr["cx"] + 0.5) * sx - 0.5
    cy = (intr["cy"] + 0.5) * sy - 0.5
    ks = " ".join(str(intr[f"k{i}"]) for i in range(1, 5))

    out_path = os.path.join(calib_dir, "camera.txt")
    with open(out_path, "w") as fp:
        fp.write(f"EquiDistant {fx} {fy} {cx} {cy} {ks}\n")
        fp.write(f"{w} {h}\n")
        fp.write("crop\n")
        fp.write(f"{w} {h}\n")
    return out_path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("calib_dir",
                    help="session dir holding calibration.json")
    ap.add_argument("--in-size", default="1280x800", type=_parse_size,
                    help="capture resolution the calibration was run at")
    ap.add_argument("--out-size", default="512x320", type=_parse_size,
                    help="runtime resolution to rescale to")
    a = ap.parse_args()
    print("wrote", convert(a.calib_dir, a.in_size, a.out_size))
