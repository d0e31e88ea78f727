import numpy as np

from iris_tpu.data.colmap import (
    ColmapImage, intrinsics_from_camera, qvec2rotmat, read_cameras_text,
    read_images_text,
)


def test_qvec_identity_and_orthonormal():
    assert np.allclose(qvec2rotmat(np.asarray([1.0, 0, 0, 0])), np.eye(3))
    q = np.asarray([0.8, 0.1, -0.3, 0.5])
    q = q / np.linalg.norm(q)
    r = qvec2rotmat(q)
    assert np.allclose(r @ r.T, np.eye(3), atol=1e-10)
    assert np.isclose(np.linalg.det(r), 1.0)


def test_read_text_files(tmp_path):
    imgs = tmp_path / "images.txt"
    imgs.write_text(
        "# comment\n"
        "1 1 0 0 0 0.5 1.5 2.5 1 frame_000.jpg\n"
        "10 20 30\n"
        "2 0.7071 0.7071 0 0 0 0 1 1 frame_001.jpg\n"
        "\n"
    )
    out = read_images_text(str(imgs))
    assert set(out) == {1, 2}
    assert out[1].name == "frame_000.jpg"
    assert np.allclose(out[1].tvec, [0.5, 1.5, 2.5])
    # identity rotation -> c2w translation = -t
    assert np.allclose(out[1].c2w()[:, 3], [-0.5, -1.5, -2.5], atol=1e-6)

    cams = tmp_path / "cameras.txt"
    cams.write_text("1 PINHOLE 640 480 500 510 320 240\n")
    c = read_cameras_text(str(cams))
    k = intrinsics_from_camera(c[1])
    assert k[0, 0] == 500 and k[1, 1] == 510 and k[0, 2] == 320
