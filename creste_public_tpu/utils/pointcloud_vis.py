"""Point-cloud / elevation-mesh visualisation.

Parity target: creste/utils/pointcloud_vis.py:101 (vispy interactive
LaserScanVis). vispy is not in this image, so the same drawing surface is
provided on matplotlib's 3-D backend: scatter point clouds colored by
height/intensity/label, elevation surface meshes, and BEV trajectory
overlays — renderable headless to PNG (the framework's debug-dump style,
SURVEY §4.1) or interactively when a display exists.
"""
from __future__ import annotations

import numpy as np


class PointCloudFigure:
    def __init__(self, figsize=(8, 8), elev: float = 35.0, azim: float = -60.0):
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        self.fig = plt.figure(figsize=figsize)
        self.ax = self.fig.add_subplot(projection="3d")
        self.ax.view_init(elev=elev, azim=azim)
        self._plt = plt

    def draw_points(
        self, points: np.ndarray, colors=None, color_by: str = "height",
        size: float = 1.0, max_points: int = 100_000, cmap: str = "turbo",
    ) -> "PointCloudFigure":
        """points [N, >=3]; colors: explicit RGB(A), per-point scalars, or
        None -> colour by ``color_by`` ('height' | 'intensity')."""
        pts = np.asarray(points)
        if len(pts) > max_points:
            idx = np.random.default_rng(0).choice(
                len(pts), max_points, replace=False
            )
            pts = pts[idx]
            if colors is not None and np.ndim(colors) >= 1 and len(colors) == len(points):
                colors = np.asarray(colors)[idx]
        if colors is None:
            scal = pts[:, 2] if color_by == "height" else (
                pts[:, 3] if pts.shape[1] > 3 else pts[:, 2]
            )
            self.ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=scal,
                            cmap=cmap, s=size)
        else:
            self.ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=colors, s=size)
        return self

    def draw_mesh_grid(
        self, height_map: np.ndarray, valid: np.ndarray | None = None,
        cell: float = 0.1, cmap: str = "viridis",
    ) -> "PointCloudFigure":
        """Elevation map [H, W] as a surface (NaN/invalid cells removed)."""
        H, W = height_map.shape
        ys, xs = np.mgrid[0:H, 0:W].astype(float) * cell
        z = np.asarray(height_map, float).copy()
        bad = ~np.isfinite(z)
        if valid is not None:
            bad |= ~np.asarray(valid, bool)
        z[bad] = np.nan
        self.ax.plot_surface(xs, ys, z, cmap=cmap, linewidth=0,
                             antialiased=False)
        return self

    def draw_trajectory(self, xyz: np.ndarray, color="red", lw: float = 2.0):
        xyz = np.asarray(xyz)
        z = xyz[:, 2] if xyz.shape[1] > 2 else np.zeros(len(xyz))
        self.ax.plot(xyz[:, 0], xyz[:, 1], z, color=color, linewidth=lw)
        return self

    def save(self, path: str) -> None:
        self.fig.savefig(path, bbox_inches="tight", dpi=120)
        self._plt.close(self.fig)

    def show(self) -> None:
        self._plt.show()


def render_scan(points: np.ndarray, path: str, **kwargs) -> None:
    """One-call scan render to PNG (the LaserScanVis quick path)."""
    PointCloudFigure().draw_points(points, **kwargs).save(path)


_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>__TITLE__</title>
<style>
 body { margin:0; background:#101014; color:#ddd; font:13px monospace;
        overflow:hidden; }
 #hud { position:fixed; top:8px; left:10px; user-select:none;
        text-shadow:0 0 4px #000; }
 canvas { display:block; }
</style></head><body>
<div id="hud"></div><canvas id="cv"></canvas>
<script>
"use strict";
// ---- embedded scans: base64 little-endian float32 [N, stride] ----
const SCANS_B64 = __SCANS__;
const STRIDES = __STRIDES__;
const LABELS_B64 = __LABELS__;   // per-scan base64 uint32 or null
const TITLE = __TITLE_JS__;
function decodeF32(b64) {
  const bin = atob(b64), n = bin.length;
  const buf = new ArrayBuffer(n), u8 = new Uint8Array(buf);
  for (let i = 0; i < n; i++) u8[i] = bin.charCodeAt(i);
  return new Float32Array(buf);
}
function decodeU32(b64) {
  const bin = atob(b64), n = bin.length;
  const buf = new ArrayBuffer(n), u8 = new Uint8Array(buf);
  for (let i = 0; i < n; i++) u8[i] = bin.charCodeAt(i);
  return new Uint32Array(buf);
}
const scans = SCANS_B64.map(decodeF32);
const labels = LABELS_B64.map(b => b === null ? null : decodeU32(b));
// ---- turbo-ish colormap ----
function cmap(t) {
  t = Math.min(1, Math.max(0, t));
  return [Math.floor(255*Math.min(1, Math.max(0, 1.6-Math.abs(4*t-3.2)))),
          Math.floor(255*Math.min(1, Math.max(0, 1.6-Math.abs(4*t-1.8)))),
          Math.floor(255*Math.min(1, Math.max(0, 1.6-Math.abs(4*t-0.6))))];
}
function labColor(l) {  // deterministic label palette
  const h = (l * 2654435761 >>> 0);
  return [64 + (h & 0xbf), 64 + ((h >> 8) & 0xbf), 64 + ((h >> 16) & 0xbf)];
}
// ---- state ----
let si = 0, colorMode = 0;  // 0 height, 1 intensity, 2 label
let yaw = -0.9, pitch = 0.5, dist = 28, cx = 6, cy = 0, cz = 0;
let ps = __POINT_SIZE__;
const cv = document.getElementById("cv"), hud = document.getElementById("hud");
const ctx = cv.getContext("2d");
let W, H, img, data32, zbuf;
function resize() {
  W = cv.width = window.innerWidth; H = cv.height = window.innerHeight;
  img = ctx.createImageData(W, H);
  data32 = new Uint32Array(img.data.buffer);
  zbuf = new Float32Array(W * H);
  draw();
}
window.addEventListener("resize", resize);
// ---- software projection + z-buffer splat (no WebGL dependency) ----
function draw() {
  data32.fill(0xff18140f); zbuf.fill(1e30);
  const f = scans[si], st = STRIDES[si], n = (f.length / st) | 0;
  const lab = labels[si];
  const cyaw = Math.cos(yaw), syaw = Math.sin(yaw);
  const cp = Math.cos(pitch), sp = Math.sin(pitch);
  const foc = 1.2 * Math.min(W, H);
  // color scaling
  let lo = 1e30, hi = -1e30;
  const ch = colorMode === 1 && st > 3 ? 3 : 2;
  for (let i = 0; i < n; i++) {
    const v = f[i * st + ch];
    if (v < lo) lo = v; if (v > hi) hi = v;
  }
  const span = Math.max(1e-6, hi - lo);
  for (let i = 0; i < n; i++) {
    const x = f[i*st] - cx, y = f[i*st+1] - cy, z = f[i*st+2] - cz;
    // world -> camera: yaw about z, pitch about x', camera at -dist
    const x1 = x * cyaw - y * syaw, y1 = x * syaw + y * cyaw;
    const y2 = y1 * cp - z * sp, z2 = y1 * sp + z * cp;
    const depth = x1 + dist;
    if (depth <= 0.2) continue;
    const u = (W >> 1) + (foc * y2 / depth) | 0;
    const v = (H >> 1) - (foc * z2 / depth) | 0;
    if (u < 0 || u >= W || v < 0 || v >= H) continue;
    let rgb;
    if (colorMode === 2 && lab) rgb = labColor(lab[i]);
    else rgb = cmap((f[i*st+ch] - lo) / span);
    const col = 0xff000000 | (rgb[2] << 16) | (rgb[1] << 8) | rgb[0];
    for (let dy = 0; dy < ps; dy++) for (let dx = 0; dx < ps; dx++) {
      const uu = u + dx, vv = v + dy;
      if (uu >= W || vv >= H) continue;
      const o = vv * W + uu;
      if (depth < zbuf[o]) { zbuf[o] = depth; data32[o] = col; }
    }
  }
  ctx.putImageData(img, 0, 0);
  hud.textContent = TITLE + "  scan " + (si+1) + "/" + scans.length +
    "  color:" + ["height","intensity","label"][colorMode] +
    "  [drag orbit / shift-drag pan / wheel zoom / N,B scan / C color]";
}
// ---- controls (LaserScanVis key map: N/B next/back) ----
let dragging = false, panning = false, lx = 0, ly = 0;
cv.addEventListener("mousedown", e => {
  dragging = true; panning = e.shiftKey || e.button === 2;
  lx = e.clientX; ly = e.clientY;
});
window.addEventListener("mouseup", () => dragging = false);
window.addEventListener("mousemove", e => {
  if (!dragging) return;
  const dx = e.clientX - lx, dy = e.clientY - ly;
  lx = e.clientX; ly = e.clientY;
  if (panning) {
    const s = dist / (1.2 * Math.min(W, H));
    const cyaw = Math.cos(yaw), syaw = Math.sin(yaw);
    cy -= dx * s * cyaw; cx += dx * s * syaw; cz += dy * s;
  } else { yaw += dx * 0.008; pitch += dy * 0.008; }
  draw();
});
cv.addEventListener("wheel", e => {
  dist *= Math.exp(e.deltaY * 0.001); e.preventDefault(); draw();
}, { passive: false });
cv.addEventListener("contextmenu", e => e.preventDefault());
window.addEventListener("keydown", e => {
  const k = e.key.toLowerCase();
  if (k === "n") si = (si + 1) % scans.length;
  else if (k === "b") si = (si + scans.length - 1) % scans.length;
  else if (k === "c") colorMode = (colorMode + 1) % 3;
  else if (k === "+") ps = Math.min(6, ps + 1);
  else if (k === "-") ps = Math.max(1, ps - 1);
  else return;
  draw();
});
resize();
</script></body></html>
"""


def export_html_viewer(
    path: str,
    scans,
    labels=None,
    point_size: int = 2,
    title: str = "creste scan viewer",
) -> str:
    """Self-contained interactive 3-D scan viewer (single HTML file).

    The reference ships a vispy interactive LaserScanVis
    (creste/utils/pointcloud_vis.py:101: orbit camera, N/B scan stepping,
    color modes); vispy/OpenGL are not available here, so the interactive
    surface is a zero-dependency HTML file: scans embedded as base64
    float32, software-projected with a JS z-buffer splat at interactive
    rates, drag-orbit / shift-drag-pan / wheel-zoom, N/B scan stepping and
    C color-mode cycling (height / intensity / label). Open in any
    browser — robot field laptops included; nothing to install.

    Args:
      path: output .html path.
      scans: one [N, >=3] array or a list of them (xyz [+ intensity]).
      labels: optional per-scan int label arrays (length N each) for the
        'label' color mode.
      point_size: splat size in pixels.
    Returns the path.
    """
    import base64
    import json
    from html import escape as html_escape
    import os

    if isinstance(scans, np.ndarray):
        scans = [scans]
    if labels is not None and isinstance(labels, np.ndarray):
        labels = [labels]

    b64s, strides, lab_b64 = [], [], []
    for i, s in enumerate(scans):
        s = np.ascontiguousarray(np.asarray(s, np.float32))
        assert s.ndim == 2 and s.shape[1] >= 3, "scan must be [N, >=3]"
        b64s.append(base64.b64encode(s.tobytes()).decode())
        strides.append(int(s.shape[1]))
        if labels is not None and labels[i] is not None:
            lab = np.ascontiguousarray(np.asarray(labels[i], np.uint32))
            assert len(lab) == len(s)
            lab_b64.append(base64.b64encode(lab.tobytes()).decode())
        else:
            lab_b64.append(None)

    html = (
        _HTML_TEMPLATE
        .replace("__SCANS__", json.dumps(b64s))
        .replace("__STRIDES__", json.dumps(strides))
        .replace("__LABELS__", json.dumps(lab_b64))
        .replace("__POINT_SIZE__", str(int(point_size)))
        # JS constant via json.dumps (escapes quotes, backslashes and
        # `</script>` via <...), <title> element via html.escape —
        # a title like `</script><script>` must not break the page.
        .replace("__TITLE_JS__",
                 json.dumps(title).replace("</", "<\\/"))
        .replace("__TITLE__", html_escape(title))
    )
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        f.write(html)
    return path
