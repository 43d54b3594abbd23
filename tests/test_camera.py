"""Camera: golden-fixture round trips on the reference's testdata camera
(full intrinsics with radial + tangential distortion)."""
import pathlib

import numpy as np
import pytest

from nerfds_tpu.camera import Camera, camera_to_rays

FIXTURE = pathlib.Path(__file__).parent / "testdata" / "camera.json"


@pytest.fixture(scope="module")
def cam():
  return Camera.from_json(FIXTURE)


def test_from_json_fields(cam):
  assert cam.image_size_x == 2448 and cam.image_size_y == 3264
  assert cam.has_radial_distortion and cam.has_tangential_distortion
  np.testing.assert_allclose(float(cam.focal_length), 2691.1704, rtol=1e-6)


def test_project_unproject_roundtrip(cam):
  """pixels -> rays -> points at depth -> project == original pixels."""
  rng = np.random.RandomState(0)
  pixels = np.stack([
      rng.uniform(200, cam.image_size_x - 200, 64),
      rng.uniform(200, cam.image_size_y - 200, 64),
  ], axis=-1).astype(np.float32)
  depth = rng.uniform(1.0, 10.0, 64).astype(np.float32)
  points = cam.pixels_to_points(pixels, depth)
  reproj = cam.project(points)
  np.testing.assert_allclose(reproj, pixels, atol=2e-2)


def test_rays_are_unit_and_world_frame(cam):
  pixels = cam.get_pixel_centers()[::512, ::512].reshape(-1, 2)
  dirs = cam.pixels_to_rays(pixels)
  np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1),
                             np.ones(len(dirs)), rtol=1e-5)
  # The center pixel's ray should be close to the optical axis.
  center = np.asarray([[float(cam.principal_point_x),
                        float(cam.principal_point_y)]], np.float32)
  d = cam.pixels_to_rays(center)[0]
  assert float(np.dot(d, cam.optical_axis)) > 0.999


def test_pixel_centers_offset(cam):
  centers = cam.get_pixel_centers()
  assert centers.shape == (3264, 2448, 2)
  np.testing.assert_allclose(centers[0, 0], [0.5, 0.5])
  np.testing.assert_allclose(centers[-1, -1], [2447.5, 3263.5])


def test_scale_halves_intrinsics(cam):
  half = cam.scale(0.5)
  np.testing.assert_allclose(half.focal_length, cam.focal_length * 0.5)
  np.testing.assert_allclose(half.principal_point, cam.principal_point * 0.5)
  assert half.image_size_x == 1224


def test_undistort_fixed_point(cam):
  """Undistortion then distortion is the identity."""
  rng = np.random.RandomState(1)
  x = rng.uniform(-0.3, 0.3, 128)
  y = rng.uniform(-0.3, 0.3, 128)
  from nerfds_tpu.camera import (_compute_residual_and_jacobian,
                                 radial_and_tangential_undistort)
  k1, k2, k3 = cam.radial_distortion
  p1, p2 = cam.tangential_distortion
  xu, yu = radial_and_tangential_undistort(x, y, k1, k2, k3, p1, p2)
  fx, fy, *_ = _compute_residual_and_jacobian(xu, yu, x, y, k1, k2, k3, p1, p2)
  np.testing.assert_allclose(fx, np.zeros_like(fx), atol=1e-6)
  np.testing.assert_allclose(fy, np.zeros_like(fy), atol=1e-6)


def test_look_at_points_camera():
  cam = Camera(orientation=np.eye(3), position=np.zeros(3), focal_length=100.0,
               principal_point=np.asarray([50.0, 50.0]),
               image_size=np.asarray([100, 100]))
  target = np.asarray([0.0, 0.0, 5.0])
  pos = np.asarray([1.0, 1.0, 0.0])
  moved = cam.look_at(pos, target, np.asarray([0.0, 1.0, 0.0]))
  axis = moved.optical_axis
  want = (target - pos) / np.linalg.norm(target - pos)
  np.testing.assert_allclose(axis, want, atol=1e-6)


def test_crop_preserves_principal_axis():
  cam = Camera(orientation=np.eye(3), position=np.zeros(3), focal_length=100.0,
               principal_point=np.asarray([50.0, 40.0]),
               image_size=np.asarray([100, 80]))
  cropped = cam.crop_image_domain(left=10, top=5)
  assert cropped.image_size_x == 90 and cropped.image_size_y == 75
  np.testing.assert_allclose(cropped.principal_point, [40.0, 35.0])


def test_camera_to_rays_bundle():
  cam = Camera(orientation=np.eye(3), position=np.asarray([1.0, 2.0, 3.0]),
               focal_length=10.0, principal_point=np.asarray([8.0, 6.0]),
               image_size=np.asarray([16, 12]))
  rays = camera_to_rays(cam)
  assert rays["origins"].shape == (12, 16, 3)
  assert rays["directions"].shape == (12, 16, 3)
  np.testing.assert_allclose(rays["origins"][0, 0], [1.0, 2.0, 3.0])
  np.testing.assert_allclose(
      np.linalg.norm(rays["directions"], axis=-1),
      np.ones((12, 16)), rtol=1e-5)


def test_json_roundtrip(tmp_path, cam):
  path = tmp_path / "cam.json"
  cam.save_json(path)
  cam2 = Camera.from_json(path)
  np.testing.assert_allclose(cam2.orientation, cam.orientation)
  np.testing.assert_allclose(cam2.position, cam.position)
  np.testing.assert_allclose(cam2.tangential_distortion,
                             cam.tangential_distortion)
