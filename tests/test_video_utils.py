"""utils/video.py parity surface (reference utils/video.py:1-215):
frames-dir <-> video, boomerang loop, merge, animated switch wipe, text
overlay — exercised through the frame-directory fallback so the test is
hermetic (no ffmpeg requirement)."""

import os

import numpy as np

from iris_tpu.utils import video as V


def _frames(n=6, h=16, w=20, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
            for _ in range(n)]


def _write(path, frames, fps=30):
    out = V.write_video(path, frames, fps=fps)
    assert os.path.exists(out)
    return out


def test_write_read_roundtrip(tmp_path):
    frames = _frames()
    out = _write(str(tmp_path / "a.mp4"), frames)
    back = V.read_video_frames(out)
    assert len(back) == len(frames)
    assert back[0].shape == (16, 20, 3)
    assert back[0].dtype == np.uint8
    # read_video_frames also resolves the fallback dir from the mp4 path
    back2 = V.read_video_frames(str(tmp_path / "a.mp4"))
    assert len(back2) == len(frames)


def test_extract_and_generate_boomerang(tmp_path):
    frames = _frames(4)
    src = _write(str(tmp_path / "src.mp4"), frames)
    outdir = str(tmp_path / "ex")
    n = V.extract_frames(src, outdir)
    assert n == 4
    assert sorted(os.listdir(outdir))[0] == "00000.png"
    # generate_video parity: dir -> video with reversed append
    out = V.frames_dir_to_video(outdir, str(tmp_path / "gen.mp4"))
    assert len(V.read_video_frames(out)) == 8


def test_loop_and_merge(tmp_path):
    a = _write(str(tmp_path / "a.mp4"), _frames(3, seed=1))
    b = _write(str(tmp_path / "b.mp4"), _frames(5, seed=2))
    lp = V.loop_video(a, str(tmp_path / "lp.mp4"))
    assert len(V.read_video_frames(lp)) == 6
    m = V.merge_videos(a, b, str(tmp_path / "m.mp4"), axis=1)
    fm = V.read_video_frames(m)
    assert len(fm) == 3 and fm[0].shape == (16, 40, 3)


def test_switch_wipe_sweeps(tmp_path):
    n, h, w = 12, 16, 20
    black = [np.zeros((h, w, 3), np.float32)] * n
    white = [np.ones((h, w, 3), np.float32)] * n
    a = _write(str(tmp_path / "blk.mp4"), black)
    b = _write(str(tmp_path / "wht.mp4"), white)
    out = V.switch_videos(a, b, str(tmp_path / "sw.mp4"), mid=n // 2,
                          window=6)
    fr = V.read_video_frames(out)
    means = [f.mean() for f in fr]
    # starts on A (black), ends on B (white), monotone-ish sweep through
    assert means[0] < 10 and means[-1] > 245
    assert any(30 < m < 225 for m in means)  # a mixed transition frame


def test_add_text_burns_label(tmp_path):
    src = _write(str(tmp_path / "t.mp4"),
                 [np.full((64, 96, 3), 0.5, np.float32)] * 2)
    out = V.add_text(src, str(tmp_path / "t2.mp4"), "GT", font_size=0.5,
                     right=True, bottom=True)
    fr = V.read_video_frames(out)
    f = fr[0].astype(int)
    # label box corner: contains both near-black box and near-white text
    assert (f < 10).any() and (f > 200).any()


def test_cli_generate(tmp_path):
    frames = _frames(3)
    src = _write(str(tmp_path / "c.mp4"), frames)
    outdir = str(tmp_path / "cf")
    V.main(["extract", "-video", src, "-outdir", outdir])
    V.main(["generate", "-dir", outdir, "-out", str(tmp_path / "cg.mp4")])
    assert len(V.read_video_frames(str(tmp_path / "cg.mp4"))) == 6
