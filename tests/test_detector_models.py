"""Detector-stack parity: the JAX RetinaFace/FAN forwards + converters vs
locally-constructed torch modules with the public checkpoints' layouts
(biubug6 Pytorch_Retinaface cfg_re50; 1adrianb face-alignment FAN) — the
repo's standard offline converter-verification idiom (no weight files or
ibug packages reachable here; see preprocess/retinaface.py docstring)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


# ------------------------------------------------------- torch: RetinaFace


def conv_bn(inp, oup, stride=1, k=3, leaky=0.0):
    return nn.Sequential(
        nn.Conv2d(inp, oup, k, stride, k // 2, bias=False),
        nn.BatchNorm2d(oup),
        nn.LeakyReLU(negative_slope=leaky, inplace=True),
    )


def conv_bn_no_relu(inp, oup, stride=1):
    return nn.Sequential(
        nn.Conv2d(inp, oup, 3, stride, 1, bias=False),
        nn.BatchNorm2d(oup),
    )


class Bottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        identity = x if self.downsample is None else self.downsample(x)
        return F.relu(out + identity)


class ResNet50Body(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for li, (planes, n, stride) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]):
            blocks = []
            for bi in range(n):
                down = None
                s = stride if bi == 0 else 1
                if bi == 0:
                    down = nn.Sequential(
                        nn.Conv2d(inplanes, planes * 4, 1, s, bias=False),
                        nn.BatchNorm2d(planes * 4))
                blocks.append(Bottleneck(inplanes, planes, s, down))
                inplanes = planes * 4
            setattr(self, f"layer{li+1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        c3 = self.layer2(x)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5


class SSH(nn.Module):
    def __init__(self, c=256):
        super().__init__()
        self.conv3X3 = conv_bn_no_relu(c, c // 2)
        self.conv5X5_1 = conv_bn(c, c // 4)
        self.conv5X5_2 = conv_bn_no_relu(c // 4, c // 4)
        self.conv7X7_2 = conv_bn(c // 4, c // 4)
        self.conv7x7_3 = conv_bn_no_relu(c // 4, c // 4)

    def forward(self, x):
        c3 = self.conv3X3(x)
        h5 = self.conv5X5_1(x)
        c5 = self.conv5X5_2(h5)
        c7 = self.conv7x7_3(self.conv7X7_2(h5))
        return F.relu(torch.cat([c3, c5, c7], dim=1))


class Head(nn.Module):
    def __init__(self, out_per_anchor, anchors=2):
        super().__init__()
        self.out = out_per_anchor
        self.conv1x1 = nn.Conv2d(256, anchors * out_per_anchor, 1)

    def forward(self, x):
        y = self.conv1x1(x).permute(0, 2, 3, 1).contiguous()
        return y.view(y.shape[0], -1, self.out)


class TorchRetinaFace(nn.Module):
    def __init__(self):
        super().__init__()
        self.body = ResNet50Body()

        class FPN(nn.Module):
            def __init__(self):
                super().__init__()
                self.output1 = conv_bn(512, 256, k=1)
                self.output2 = conv_bn(1024, 256, k=1)
                self.output3 = conv_bn(2048, 256, k=1)
                self.merge1 = conv_bn(256, 256)
                self.merge2 = conv_bn(256, 256)

            def forward(self, c3, c4, c5):
                o1, o2, o3 = self.output1(c3), self.output2(c4), self.output3(c5)
                o2 = self.merge2(o2 + F.interpolate(
                    o3, size=o2.shape[2:], mode="nearest"))
                o1 = self.merge1(o1 + F.interpolate(
                    o2, size=o1.shape[2:], mode="nearest"))
                return o1, o2, o3

        self.fpn = FPN()
        self.ssh1, self.ssh2, self.ssh3 = SSH(), SSH(), SSH()
        self.ClassHead = nn.ModuleList([Head(2) for _ in range(3)])
        self.BboxHead = nn.ModuleList([Head(4) for _ in range(3)])
        self.LandmarkHead = nn.ModuleList([Head(10) for _ in range(3)])

    def forward(self, x):
        feats = self.fpn(*self.body(x))
        feats = [s(f) for s, f in zip((self.ssh1, self.ssh2, self.ssh3), feats)]
        loc = torch.cat([self.BboxHead[i](f) for i, f in enumerate(feats)], 1)
        conf = torch.cat([self.ClassHead[i](f) for i, f in enumerate(feats)], 1)
        ldm = torch.cat([self.LandmarkHead[i](f) for i, f in enumerate(feats)], 1)
        return loc, F.softmax(conf, dim=-1), ldm


@pytest.mark.slow
def test_retinaface_forward_parity():
    from omni_avsr_tpu.convert.detector_torch import convert_retinaface
    from omni_avsr_tpu.preprocess.retinaface import retinaface_forward

    torch.manual_seed(0)
    net = TorchRetinaFace().eval()
    # randomize BN stats so the fold is actually exercised
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.02)
            m.running_var.uniform_(0.5, 1.5)
    params = convert_retinaface(net.state_dict())
    rng = np.random.RandomState(1)
    x = rng.randn(1, 96, 128, 3).astype(np.float32) * 20
    with torch.no_grad():
        t_loc, t_conf, t_ldm = net(torch.from_numpy(
            x.transpose(0, 3, 1, 2)).contiguous())
    j_loc, j_conf, j_ldm = retinaface_forward(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_loc), t_loc.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(j_conf), t_conf.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(j_ldm), t_ldm.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_priors_match_reference_order():
    """Anchor grid matches the PriorBox product(range(fh), range(fw)) x
    min_sizes order and normalized values (spot-checked analytically)."""
    from omni_avsr_tpu.preprocess.retinaface import priors_for

    pr = priors_for(96, 128)
    fh0, fw0 = 12, 16  # 96/8, 128/8
    assert pr.shape == ((fh0 * fw0 + 6 * 8 + 3 * 4) * 2, 4)
    np.testing.assert_allclose(pr[0], [0.5 * 8 / 128, 0.5 * 8 / 96,
                                       16 / 128, 16 / 96], rtol=1e-6)
    np.testing.assert_allclose(pr[1], [0.5 * 8 / 128, 0.5 * 8 / 96,
                                       32 / 128, 32 / 96], rtol=1e-6)
    # second anchor position: j=1 (same row)
    np.testing.assert_allclose(pr[2][0], 1.5 * 8 / 128, rtol=1e-6)


def test_nms_and_decode():
    from omni_avsr_tpu.preprocess.retinaface import decode_boxes, nms

    priors = np.array([[0.5, 0.5, 0.2, 0.2]], np.float32)
    dec = decode_boxes(np.zeros((1, 4), np.float32), priors)
    np.testing.assert_allclose(dec[0], [0.4, 0.4, 0.6, 0.6], rtol=1e-6)
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                     np.float32)
    keep = nms(boxes, np.array([0.9, 0.8, 0.7], np.float32), 0.4)
    assert keep == [0, 2]


# -------------------------------------------------------------- torch: FAN


class TorchConvBlock(nn.Module):
    def __init__(self, inp, out):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(inp)
        self.conv1 = nn.Conv2d(inp, out // 2, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out // 2)
        self.conv2 = nn.Conv2d(out // 2, out // 4, 3, 1, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out // 4)
        self.conv3 = nn.Conv2d(out // 4, out // 4, 3, 1, 1, bias=False)
        self.downsample = None
        if inp != out:
            self.downsample = nn.Sequential(
                nn.BatchNorm2d(inp), nn.ReLU(True),
                nn.Conv2d(inp, out, 1, 1, bias=False))

    def forward(self, x):
        o1 = self.conv1(F.relu(self.bn1(x)))
        o2 = self.conv2(F.relu(self.bn2(o1)))
        o3 = self.conv3(F.relu(self.bn3(o2)))
        out = torch.cat([o1, o2, o3], 1)
        res = x if self.downsample is None else self.downsample(x)
        return out + res


class TorchHourGlass(nn.Module):
    def __init__(self, depth=4):
        super().__init__()
        self.depth = depth
        self._gen(depth)

    def _gen(self, level):
        self.add_module("b1_" + str(level), TorchConvBlock(256, 256))
        self.add_module("b2_" + str(level), TorchConvBlock(256, 256))
        if level > 1:
            self._gen(level - 1)
        else:
            self.add_module("b2_plus_" + str(level), TorchConvBlock(256, 256))
        self.add_module("b3_" + str(level), TorchConvBlock(256, 256))

    def _fwd(self, level, inp):
        up1 = self._modules["b1_" + str(level)](inp)
        low1 = self._modules["b2_" + str(level)](F.avg_pool2d(inp, 2, 2))
        if level > 1:
            low2 = self._fwd(level - 1, low1)
        else:
            low2 = self._modules["b2_plus_" + str(level)](low1)
        low3 = self._modules["b3_" + str(level)](low2)
        return up1 + F.interpolate(low3, scale_factor=2, mode="nearest")

    def forward(self, x):
        return self._fwd(self.depth, x)


class TorchFAN(nn.Module):
    def __init__(self, num_modules=2):
        super().__init__()
        self.num_modules = num_modules
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = TorchConvBlock(64, 128)
        self.conv3 = TorchConvBlock(128, 128)
        self.conv4 = TorchConvBlock(128, 256)
        for i in range(num_modules):
            self.add_module("m" + str(i), TorchHourGlass())
            self.add_module("top_m_" + str(i), TorchConvBlock(256, 256))
            self.add_module("conv_last" + str(i), nn.Conv2d(256, 256, 1))
            self.add_module("bn_end" + str(i), nn.BatchNorm2d(256))
            self.add_module("l" + str(i), nn.Conv2d(256, 68, 1))
            if i < num_modules - 1:
                self.add_module("bl" + str(i), nn.Conv2d(256, 256, 1))
                self.add_module("al" + str(i), nn.Conv2d(68, 256, 1))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.avg_pool2d(self.conv2(x), 2, 2)
        x = self.conv4(self.conv3(x))
        previous, out = x, None
        for i in range(self.num_modules):
            ll = self._modules["top_m_" + str(i)](
                self._modules["m" + str(i)](previous))
            ll = F.relu(self._modules["bn_end" + str(i)](
                self._modules["conv_last" + str(i)](ll)))
            out = self._modules["l" + str(i)](ll)
            if i < self.num_modules - 1:
                previous = (previous + self._modules["bl" + str(i)](ll)
                            + self._modules["al" + str(i)](out))
        return out


@pytest.mark.slow
def test_fan_forward_parity():
    from omni_avsr_tpu.convert.detector_torch import convert_fan
    from omni_avsr_tpu.preprocess.fan import fan_forward

    torch.manual_seed(0)
    net = TorchFAN(num_modules=2).eval()
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.02)
            m.running_var.uniform_(0.5, 1.5)
    params = convert_fan(net.state_dict(), num_modules=2)
    rng = np.random.RandomState(2)
    x = rng.rand(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        t = net(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous())
    j = fan_forward(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(j), t.numpy().transpose(0, 2, 3, 1), rtol=2e-3, atol=2e-3)


def test_heatmap_decode_quarter_pixel():
    from omni_avsr_tpu.preprocess.fan import heatmaps_to_landmarks

    hm = np.zeros((64, 64, 68), np.float32)
    hm[10, 20, :] = 1.0
    hm[10, 21, :] = 0.5  # stronger right neighbour -> +0.25 px shift
    pts = heatmaps_to_landmarks(hm, center=np.array([128.0, 128.0]),
                                side=256.0)
    np.testing.assert_allclose(pts[0], [(20 + 0.25 + 0.5) * 4 + 0.0,
                                        (10 + 0.5) * 4], atol=1e-6)


def test_crop_face_geometry():
    from omni_avsr_tpu.preprocess.fan import CropSpec, crop_face

    frame = np.zeros((200, 300, 3), np.uint8)
    frame[80:120, 140:180] = 200  # bright square
    patch, center, side = crop_face(frame, np.array([130, 70, 190, 130.0]))
    assert patch.shape == (256, 256, 3)
    np.testing.assert_allclose(center, [160.0, 100 - 60 * 0.12])
    # the bright region lands near the patch center
    assert patch[128, 128].mean() > 0.5


def test_jax_detector_end_to_end_random_weights():
    """The full reference detector pipeline (RetinaFace detect -> largest
    face -> FAN landmarks) executes with random weights in the converter's
    exact layout — the path that runs unchanged the day the public .pth
    files are reachable (weights are env-blocked, see PARITY.md)."""
    from omni_avsr_tpu.convert.detector_torch import init_fan, init_retinaface
    from omni_avsr_tpu.preprocess.detector import JaxLandmarksDetector

    rf = init_retinaface(0)
    for h in rf["class_head"]:  # bias the face class so detections fire
        h["b"][1::2] += 6.0
    for h in rf["bbox_head"]:  # keep random regressions in a sane range
        h["w"] *= 1e-3
    det = JaxLandmarksDetector(rf, init_fan(0), threshold=0.5)
    rng = np.random.RandomState(5)
    frames = rng.randint(0, 255, size=(2, 96, 128, 3), dtype=np.uint8)
    lms = det(frames)
    assert len(lms) == 2
    for lm in lms:
        assert lm is not None and lm.shape == (68, 2) and np.isfinite(lm).all()


def test_decode_boxes_exp_clamped_and_nonfinite_filtered():
    """Garbage regressions must surface as "no detection", never as a
    garbage crop (ADVICE r3: retinaface.py:165)."""
    from omni_avsr_tpu.preprocess.retinaface import decode_boxes, priors_for

    priors = priors_for(96, 128)
    loc = np.full((len(priors), 4), 1e6, np.float32)  # would exp-overflow
    with np.errstate(over="raise", invalid="raise"):
        boxes = decode_boxes(loc, priors)  # no overflow warning/error
    assert np.isfinite(boxes).all()


def test_detect_faces_drops_nonfinite_boxes(monkeypatch):
    from omni_avsr_tpu.preprocess import retinaface as rf

    n = len(rf.priors_for(32, 32))

    def fake_forward(params, images):
        loc = jnp.zeros((1, n, 4))
        loc = loc.at[0, 0].set(jnp.nan)  # top-scoring anchor decodes to NaN
        conf = jnp.stack([jnp.zeros((1, n)), jnp.ones((1, n)) * 0.99], axis=-1)
        return loc, conf, jnp.zeros((1, n, 10))

    monkeypatch.setattr(rf, "_retinaface_forward_jit", fake_forward)
    frame = np.zeros((32, 32, 3), np.uint8)
    faces = rf.detect_faces({}, frame, threshold=0.5)
    assert np.isfinite(faces).all()  # NaN anchor dropped, others kept
    assert len(faces) >= 1


def test_crop_face_zero_pads_outside_frame():
    """1adrianb crop zero-pads out-of-frame regions (ADVICE r3: fan.py:134):
    a face box hanging off the left edge must see black, not a
    clamp-to-edge smear of column 0."""
    from omni_avsr_tpu.preprocess.fan import crop_face

    frame = np.full((100, 100, 3), 255, np.uint8)
    # box centered at x=0: half the crop square is outside the frame
    patch, center, side = crop_face(frame, np.array([-30.0, 20, 30, 80]))
    assert side > 0
    left = patch[:, : patch.shape[1] // 4].mean()
    # patch center maps to image x=0 (the edge itself, half-covered);
    # probe at 3/4 width, which maps ~30 px INTO the frame
    right = patch[patch.shape[0] // 2, 3 * patch.shape[1] // 4].mean()
    assert left < 0.05  # zero-padded, NOT smeared white
    assert right > 0.99  # in-frame samples untouched


def test_crop_face_degenerate_box_raises():
    from omni_avsr_tpu.preprocess.fan import crop_face

    frame = np.zeros((50, 50, 3), np.uint8)
    for bad in ([np.nan, 0, 10, 10], [10, 10, 10, 40], [10, 10, 40, 5]):
        with pytest.raises(ValueError):
            crop_face(frame, np.array(bad, np.float64))


def test_jax_detector_degenerate_face_yields_none(monkeypatch):
    """A degenerate largest-face box maps the FRAME to None (reference
    semantics: interpolation covers gaps, video_process.py:120-145)."""
    from omni_avsr_tpu.preprocess import detector as det_mod

    d = det_mod.JaxLandmarksDetector.__new__(det_mod.JaxLandmarksDetector)
    d.rf, d.fan, d.threshold = {}, {}, 0.8

    monkeypatch.setattr(
        det_mod, "largest_face_index", lambda f: 0, raising=True)
    import omni_avsr_tpu.preprocess.retinaface as rf

    monkeypatch.setattr(
        rf, "detect_faces",
        lambda *a, **k: np.array([[np.nan, 0, 10, 10, 0.9]], np.float32))
    out = d(np.zeros((1, 32, 32, 3), np.uint8))
    assert out == [None]
