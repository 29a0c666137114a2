"""Self-contained HTML scan viewer (vispy LaserScanVis equivalent).

No browser exists in this image, so the test verifies what the HTML
carries: the base64 float32/uint32 payloads roundtrip bit-exactly, the
template has no unexpanded placeholders, and a NumPy port of the embedded
JS projection puts most points on screen at the default camera (i.e. the
default view is not empty).
"""
import base64
import json
import re

import numpy as np

from creste_public_tpu.utils.pointcloud_vis import export_html_viewer


def _extract(html, name):
    m = re.search(rf"const {name} = (\[.*?\]);", html)
    assert m, name
    return json.loads(m.group(1))


def test_payload_roundtrip_and_template(tmp_path):
    rng = np.random.default_rng(0)
    s0 = rng.normal(size=(1000, 4)).astype(np.float32)
    s0[:, 0] += 8
    s1 = (s0 * 1.2).astype(np.float32)
    lab = rng.integers(0, 12, 1000).astype(np.uint32)

    path = export_html_viewer(str(tmp_path / "v.html"), [s0, s1],
                              labels=[lab, None], point_size=3,
                              title="unit viewer")
    html = open(path).read()
    assert "__SCANS__" not in html and "__TITLE__" not in html
    assert "__POINT_SIZE__" not in html and "__LABELS__" not in html

    scans = _extract(html, "SCANS_B64")
    strides = _extract(html, "STRIDES")
    labels = _extract(html, "LABELS_B64")
    assert strides == [4, 4]
    got0 = np.frombuffer(base64.b64decode(scans[0]), np.float32)
    np.testing.assert_array_equal(got0.reshape(-1, 4), s0)
    got_lab = np.frombuffer(base64.b64decode(labels[0]), np.uint32)
    np.testing.assert_array_equal(got_lab, lab)
    assert labels[1] is None


def test_default_camera_sees_the_scan(tmp_path):
    """NumPy port of the viewer's JS projection: with the default camera
    (yaw=-0.9, pitch=0.5, dist=28, center (6,0,0)) a forward-looking scan
    must land mostly on a 1280x720 screen."""
    rng = np.random.default_rng(1)
    pts = np.stack([
        rng.uniform(2, 14, 4000), rng.uniform(-6, 6, 4000),
        rng.uniform(-1, 2, 4000),
    ], 1).astype(np.float32)
    export_html_viewer(str(tmp_path / "v.html"), pts)

    W, H = 1280, 720
    yaw, pitch, dist = -0.9, 0.5, 28.0
    cx, cy, cz = 6.0, 0.0, 0.0
    x, y, z = pts[:, 0] - cx, pts[:, 1] - cy, pts[:, 2] - cz
    x1 = x * np.cos(yaw) - y * np.sin(yaw)
    y1 = x * np.sin(yaw) + y * np.cos(yaw)
    y2 = y1 * np.cos(pitch) - z * np.sin(pitch)
    z2 = y1 * np.sin(pitch) + z * np.cos(pitch)
    depth = x1 + dist
    foc = 1.2 * min(W, H)
    u = W // 2 + (foc * y2 / depth).astype(int)
    v = H // 2 - (foc * z2 / depth).astype(int)
    vis = (depth > 0.2) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    assert vis.mean() > 0.9


def test_title_injection_safe(tmp_path):
    """ADVICE r4: a title containing </script>, quotes, or backslashes
    must not break the generated page (json.dumps for JS, html escape
    for <title>)."""
    s = np.random.default_rng(0).random((5, 4)).astype(np.float32)
    evil = '</script><script>alert(1)//"\\'
    path = export_html_viewer(str(tmp_path / "t.html"), [s], title=evil)
    text = open(path).read()
    assert "</script><script>alert" not in text
    # the JS constant parses back to the original title
    import json as _json
    js = [ln for ln in text.splitlines() if ln.startswith("const TITLE")][0]
    val = js.split("=", 1)[1].strip().rstrip(";")
    assert _json.loads(val.replace("<\\/", "</")) == evil
