"""JAX Mask-RCNN tests: fixed-shape pipeline, level assignment, OpenCV
adapter integration, torchvision weight-port mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advshadow_tpu.masks.maskrcnn import (
    Detections,
    MaskRCNN,
    MaskRCNNConfig,
    _fpn_level_for_boxes,
    detections_to_opencv,
)

CFG = MaskRCNNConfig(num_classes=5, pre_nms_top_n=32, post_nms_top_n=8,
                     max_detections=4)


@pytest.fixture(scope="module")
def model_and_params():
    m = MaskRCNN(CFG)
    x = jax.random.uniform(jax.random.PRNGKey(0), (64, 64, 3))
    params = jax.jit(m.init)(jax.random.PRNGKey(1), x)
    return m, params


class TestPipeline:
    def test_fixed_shapes(self, model_and_params):
        m, params = model_and_params
        x = jax.random.uniform(jax.random.PRNGKey(2), (64, 64, 3))
        det = jax.jit(m.apply)(params, x)
        assert det.boxes.shape == (4, 4)
        assert det.scores.shape == (4,)
        assert det.classes.shape == (4,)
        assert det.masks.shape == (4, 28, 28)
        # boxes clipped to the image
        assert float(det.boxes.min()) >= 0
        assert float(det.boxes.max()) <= 64
        # classes are foreground (background=0 never predicted)
        assert int(det.classes.min()) >= 1
        assert np.all((np.asarray(det.masks) >= 0)
                      & (np.asarray(det.masks) <= 1))

    def test_feeds_mask_extraction(self, model_and_params):
        from advshadow_tpu.masks.extract import combine_detection_masks

        m, params = model_and_params
        x = jax.random.uniform(jax.random.PRNGKey(3), (64, 64, 3))
        det = jax.jit(m.apply)(params, x)
        boxes, masks = detections_to_opencv(det, (64, 64), CFG.num_classes)
        assert boxes.shape == (1, 1, 4, 7)
        assert masks.shape == (4, CFG.num_classes, 28, 28)
        out = combine_detection_masks((64, 64), boxes, masks,
                                      confidence_threshold=0.0)
        assert out.shape == (64, 64)


class TestLevelAssignment:
    def test_torchvision_level_mapper(self):
        """k = floor(4 + log2(sqrt(area)/224)) clipped [2,5], 0-based."""
        boxes = jnp.asarray([
            [0, 0, 56, 56],     # sqrt(area)=56 -> 4+log2(0.25)=2 -> P2 (0)
            [0, 0, 112, 112],   # -> 3 -> P3 (1)
            [0, 0, 224, 224],   # -> 4 -> P4 (2)
            [0, 0, 448, 448],   # -> 5 -> P5 (3)
            [0, 0, 900, 900],   # clips to 5 -> P5 (3)
            [0, 0, 8, 8],       # clips to 2 -> P2 (0)
        ], jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(_fpn_level_for_boxes(boxes)), [0, 1, 2, 3, 3, 0])


class TestPorting:
    def test_port_maskrcnn_structure(self, model_and_params):
        """A synthetic torchvision-named state dict ports into the exact
        flax tree of a fresh init."""
        from tests.torch_refs import torch_resnet50

        from advshadow_tpu.victims.port import port_maskrcnn

        m, params = model_and_params
        ref = params["params"]

        # build the torch-shaped dict: resnet50 body + synthetic heads
        import torch

        rng = np.random.default_rng(0)
        body = torch_resnet50(num_classes=1)
        sd = {f"backbone.body.{k}": v.detach().numpy()
              for k, v in body.state_dict().items()
              if not k.startswith("fc.")}

        def add_conv(name, cin, cout, k, bias=True):
            sd[f"{name}.weight"] = rng.random((cout, cin, k, k)).astype(np.float32)
            if bias:
                sd[f"{name}.bias"] = rng.random(cout).astype(np.float32)

        for i, cin in enumerate((256, 512, 1024, 2048)):
            add_conv(f"backbone.fpn.inner_blocks.{i}.0", cin, 256, 1)
            add_conv(f"backbone.fpn.layer_blocks.{i}.0", 256, 256, 3)
        add_conv("rpn.head.conv.0.0", 256, 256, 3)
        add_conv("rpn.head.cls_logits", 256, 3, 1)
        add_conv("rpn.head.bbox_pred", 256, 12, 1)
        for name, cin, cout in (("fc6", 256 * 49, 1024), ("fc7", 1024, 1024)):
            sd[f"roi_heads.box_head.{name}.weight"] = rng.random(
                (cout, cin)).astype(np.float32)
            sd[f"roi_heads.box_head.{name}.bias"] = rng.random(cout).astype(np.float32)
        for name, cout in (("cls_score", 5), ("bbox_pred", 20)):
            sd[f"roi_heads.box_predictor.{name}.weight"] = rng.random(
                (cout, 1024)).astype(np.float32)
            sd[f"roi_heads.box_predictor.{name}.bias"] = rng.random(cout).astype(np.float32)
        for i in range(1, 5):
            add_conv(f"roi_heads.mask_head.mask_fcn{i}.0", 256, 256, 3)
        sd["roi_heads.mask_predictor.conv5_mask.weight"] = rng.random(
            (256, 256, 2, 2)).astype(np.float32)  # torch deconv [in,out,kh,kw]
        sd["roi_heads.mask_predictor.conv5_mask.bias"] = rng.random(256).astype(np.float32)
        add_conv("roi_heads.mask_predictor.mask_fcn_logits", 256, 5, 1)

        variables = port_maskrcnn(sd)
        flat_ref = {jax.tree_util.keystr(k): v.shape for k, v in
                    jax.tree_util.tree_flatten_with_path(ref)[0]}
        flat_got = {jax.tree_util.keystr(k): np.shape(v) for k, v in
                    jax.tree_util.tree_flatten_with_path(
                        variables["params"])[0]}
        assert flat_ref == flat_got
        # ported weights run through the full graph
        x = jax.random.uniform(jax.random.PRNGKey(4), (64, 64, 3))
        det = m.apply(variables, x)
        assert det.boxes.shape == (4, 4)
        assert np.all(np.isfinite(np.asarray(det.scores)))


class TestJaxDetectorInPipeline:
    def test_end_to_end_extraction(self, tmp_path):
        """The JAX detector slots into the offline extraction pipeline
        (detect -> combine -> native GrabCut) end to end."""
        import cv2

        from advshadow_tpu.masks.extract import (
            make_jax_maskrcnn_detector,
            process_image,
        )

        detect = make_jax_maskrcnn_detector(
            num_classes=3, image_size=64, pre_nms_top_n=32,
            post_nms_top_n=8, max_detections=4, box_score_threshold=0.0)
        img = np.full((80, 80, 3), 240, np.uint8)
        img[20:60, 20:60] = (160, 90, 40)
        mask = process_image(img, detect, confidence_threshold=0.0,
                             mask_threshold=0.1, grabcut_iter=2,
                             resize_width=64)
        # random weights: any binary mask (or none) is acceptable; the
        # pipeline must run without shape errors
        assert mask is None or (mask.dtype == np.uint8
                                and set(np.unique(mask)) <= {0, 255})


class TestClassAwareNMS:
    def test_overlapping_boxes_of_different_classes_both_survive(self):
        """Per-class NMS (coordinate-offset trick): identical boxes with
        different classes must not suppress each other."""
        import jax.numpy as jnp

        from advshadow_tpu.masks.detector import nms

        boxes = jnp.asarray([[0, 0, 10, 10.0], [0, 0, 10, 10.0]])
        scores = jnp.asarray([0.9, 0.8])
        cls = jnp.asarray([1, 2], jnp.int32)
        shifted = boxes + cls[:, None].astype(jnp.float32) * 100.0
        idx, valid = nms(shifted, scores, 2, 0.5)
        assert bool(valid.all())  # both kept
        # same class: second suppressed
        idx2, valid2 = nms(boxes, scores, 2, 0.5)
        assert bool(valid2[0]) and not bool(valid2[1])
