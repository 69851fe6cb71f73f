"""Digitize the reference's published ElmerFEM validation curves.

The reference's acceptance criterion for the TEAM7-modified benchmark is a
visual overlay of eddy-current density along Line X / Line Y at t = 0.017 s
against ElmerFEM (README.md:113-129, img/valid_Line_Xa.jpg,
img/valid_Line_Ya.jpg).  This script converts that visual artifact into
numbers: axis-calibrated pixel extraction of the three series (Jm
magnitude in blue, Jx in cyan, Jy in red) from the published JPGs.

Method (deterministic, auditable):

1. **Frame detection** — the plot box is the pair of rows/columns whose
   non-white pixel fraction exceeds 0.6.
2. **Axis calibration** — the tick grid is recovered by brute-force
   fitting a uniform arithmetic sequence (start, spacing) to a per-row /
   per-column "gridline score" (fraction of gray pixels inside the frame
   plus tick-label ink just outside it), maximizing total score over all
   plausible spacings.  The tick *values* are read from the published
   axis labels and hard-coded per image below.
3. **Series extraction** — pixels inside the frame are classified by
   color (generous thresholds against JPEG artifacts); per pixel-column
   the series value is the median row of its color class.  The published
   figures draw Elmer solid and EC3D dashed in the same colors, so the
   extraction yields the published agreement corridor of the two codes
   (they overlap to a few pixels almost everywhere); the stated tolerance
   of the comparison test includes this corridor width.

Outputs: ``elmer_digitized.npz`` with, per line, the distance coordinate
(m) and the three series (A/m^2) on a uniform 161-point grid.

Usage: python docs/validation/digitize_elmer.py
(requires the reference mount at /root/reference for the JPGs; the
committed npz makes the test hermetic.)
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
IMG_DIR = "/root/reference/img"

# per-image tick values as published on the axes
SPEC = {
    "lineX": {
        "file": "valid_Line_Xa.jpg",
        "xticks": [0.0, 0.05, 0.10, 0.15, 0.20, 0.25, 0.30],
        "yticks": [150e3, 100e3, 50e3, 0.0, -50e3, -100e3],  # top -> bottom
    },
    "lineY": {
        "file": "valid_Line_Ya.jpg",
        "xticks": [0.0, 0.05, 0.10, 0.15, 0.20, 0.25, 0.30],
        "yticks": [200e3, 100e3, 0.0, -100e3, -200e3],
    },
}


def _frame(img):
    nonwhite = (img < 200).any(axis=2)
    cols = np.nonzero(nonwhite.mean(axis=0) > 0.6)[0]
    rows = np.nonzero(nonwhite.mean(axis=1) > 0.6)[0]
    if len(cols) < 2 or len(rows) < 2:
        raise ValueError("plot frame not found")
    return cols[0], cols[-1], rows[0], rows[-1]


def _clusters(score, thresh, gap=5):
    """Weighted centers of score runs above thresh separated by > gap."""
    idx = np.nonzero(score > thresh)[0]
    if len(idx) == 0:
        return []
    groups = np.split(idx, np.nonzero(np.diff(idx) > gap)[0] + 1)
    return [float(np.average(grp, weights=score[grp])) for grp in groups]


def _calibrate(img, spec):
    """Tick-label-anchored axis calibration: each numeric axis label is a
    block of dark text centered on its tick (x labels below the frame,
    y labels right-aligned left of it); the label blocks are clustered and
    a linear least-squares pixel->data map fitted through (center, value)
    pairs.  Cluster counts must match the published tick lists exactly —
    any drift in detection fails loudly instead of mis-calibrating."""
    x0, x1, y0, y1 = _frame(img)
    inky = (img < 140).all(axis=2)

    # x tick labels: text rows just below the bottom frame
    col_score = inky[y1 + 2:y1 + 13].sum(axis=0).astype(float)
    # y tick labels: text columns left of the frame (excluding the y-axis
    # title at the far left and anything below the frame, i.e. x labels)
    row_score = inky[:y1 - 2, max(x0 - 46, 14):x0 - 2].sum(axis=1).astype(float)

    cx = _clusters(col_score, 0.5)
    cy = _clusters(row_score, 0.5)
    xt = np.asarray(spec["xticks"])
    yt = np.asarray(spec["yticks"])
    if len(cx) != len(xt):
        raise ValueError(f"expected {len(xt)} x tick labels, found {len(cx)}")
    if len(cy) != len(yt):
        raise ValueError(f"expected {len(yt)} y tick labels, found {len(cy)}")
    # label-center spacing must be uniform to ~2 px (they sit on a grid)
    for c in (cx, cy):
        d = np.diff(c)
        if d.max() - d.min() > 4.0:
            raise ValueError(f"non-uniform tick spacing {np.round(d, 1)}")
    mx = np.polyfit(cx, xt, 1)
    my = np.polyfit(cy, yt, 1)
    return (x0, x1, y0, y1), np.poly1d(mx), np.poly1d(my)


def _series_masks(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    cyan = (b > 120) & (g > 110) & (g - r > 25) & (b - r > 25)
    blue = (b > 110) & (b - r > 45) & (b - g > 45) & ~cyan
    red = (r > 130) & (r - g > 45) & (r - b > 25)
    return {"Jm": blue, "Jx": cyan, "Jy": red}


def digitize(image_path, spec, n_out=161):
    from PIL import Image

    img = np.asarray(Image.open(image_path).convert("RGB")).astype(int)
    (x0, x1, y0, y1), to_x, to_y = _calibrate(img, spec)
    masks = _series_masks(img)

    xs = np.linspace(spec["xticks"][0], spec["xticks"][-1], n_out)
    out = {"dist": xs}
    for name, mask in masks.items():
        m = mask[y0 + 1:y1, x0 + 1:x1]
        cols, vals, his, los = [], [], [], []
        for c in range(m.shape[1]):
            rows = np.nonzero(m[:, c])[0]
            if len(rows) == 0:
                continue
            cols.append(to_x(c + x0 + 1))
            # median row -> profile value; extreme rows -> the envelope
            # (needed where the curve is near-vertical, e.g. the x->0
            # spike, where a column's median is the segment midpoint)
            vals.append(to_y(np.median(rows) + y0 + 1))
            his.append(to_y(rows.min() + y0 + 1))   # topmost = largest J
            los.append(to_y(rows.max() + y0 + 1))
        cols = np.asarray(cols)
        if len(cols) < 50:
            raise ValueError(f"series {name}: too few pixels ({len(cols)})")
        # 5-column median filter: annotation arrowheads touching a curve
        # contaminate single columns (visible as 1-px spikes otherwise)
        vals = np.asarray(vals)
        if len(vals) >= 5:
            sl = np.lib.stride_tricks.sliding_window_view(
                np.pad(vals, 2, mode="edge"), 5)
            vals = np.median(sl, axis=1)
        out[name] = np.interp(xs, cols, vals)
        out[f"{name}_peak"] = float(np.max(his))
        out[f"{name}_trough"] = float(np.min(los))
    return out


def main():
    arrays = {}
    for key, spec in SPEC.items():
        path = os.path.join(IMG_DIR, spec["file"])
        res = digitize(path, spec)
        for name, arr in res.items():
            arrays[f"{key}_{name}"] = arr
        # internal consistency: the published magnitude must match the
        # magnitude of the published components to digitization accuracy
        jm = np.hypot(res["Jx"], res["Jy"])
        err = np.abs(jm - res["Jm"]).max() / np.abs(res["Jm"]).max()
        print(f"{key}: |(Jx,Jy)| vs Jm max dev {100 * err:.1f}% "
              f"(digitization-accuracy self-check)")
        arrays[f"{key}_selfcheck_dev"] = np.asarray(err)
    out = os.path.join(HERE, "elmer_digitized.npz")
    np.savez_compressed(out, **arrays)
    print("wrote", out)
    _overlay_png(arrays)


def _overlay_png(arrays):
    """Framework profiles over the digitized Elmer curves — the
    quantitative counterpart of the reference's Fig. 5 overlay."""
    lines_npz = os.path.join(HERE, "team7_lines.npz")
    if not os.path.exists(lines_npz):
        return
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    lines = np.load(lines_npz)
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    for ax, key, title in ((axes[0], "lineY", "Line Y"),
                           (axes[1], "lineX", "Line X")):
        d = lines["dist"]
        prof = lines[key]
        jm = np.sqrt((prof ** 2).sum(0))
        xs = arrays[f"{key}_dist"]
        for series, col, our in (("Jm", "tab:blue", jm),
                                 ("Jx", "tab:cyan", prof[0]),
                                 ("Jy", "tab:red", prof[1])):
            ax.plot(xs, arrays[f"{key}_{series}"] / 1e3, col,
                    lw=1.0, label=f"{series} (Elmer, digitized)")
            ax.plot(d, our / 1e3, col, ls="--", lw=1.2,
                    label=f"{series} (this framework)")
        ax.set_xlabel(f"{title}, m")
        ax.set_ylabel("J, kA/m$^2$")
        ax.set_title(f"{title} @ t = 0.017 s")
        ax.grid(alpha=0.3)
    axes[0].legend(fontsize=7, loc="lower right")
    fig.tight_layout()
    png = os.path.join(HERE, "team7_lines_vs_elmer.png")
    fig.savefig(png, dpi=110)
    print("wrote", png)


if __name__ == "__main__":
    main()
