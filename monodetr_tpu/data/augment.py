"""SSD-style augmentation suite (host-side numpy).

`PhotometricDistort` — the only transform the shipped KITTI pipeline uses
(kitti_dataset.py:134-136) — has parity with lib/datasets/kitti/pd.py:376-397:
random brightness, then either [contrast -> HSV saturation/hue] or
[HSV saturation/hue -> contrast], then random channel swap.  cv2 HSV
conversions, float32 pixel math, same probability structure (each step fires
with p=0.5 through numpy's global RandomState — the dataset seeds it).

The rest of the SSD chain (pd.py:9-374,400-416: box-aware crop/expand/mirror,
coordinate conversions, the composed `SSDAugmentation`) is dead code in the
reference but part of its public surface; it is provided below in the same
(image, boxes, labels) callable style for users who compose their own
pipelines.  All of it is host-side — augmented batches enter the jitted step
as fixed-shape arrays.
"""

import cv2
import numpy as np
from numpy import random

PERMS = ((0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0))


def _random_contrast(image, lower=0.5, upper=1.5):
    if random.randint(2):
        image *= random.uniform(lower, upper)
    return image


def _random_saturation(image, lower=0.5, upper=1.5):
    if random.randint(2):
        image[:, :, 1] *= random.uniform(lower, upper)
    return image


def _random_hue(image, delta=18.0):
    if random.randint(2):
        image[:, :, 0] += random.uniform(-delta, delta)
        image[:, :, 0][image[:, :, 0] > 360.0] -= 360.0
        image[:, :, 0][image[:, :, 0] < 0.0] += 360.0
    return image


def _random_brightness(image, delta=32.0):
    if random.randint(2):
        image += random.uniform(-delta, delta)
    return image


def _random_lighting_noise(image):
    if random.randint(2):
        swap = PERMS[random.randint(len(PERMS))]
        image = image[:, :, swap]
    return image


class PhotometricDistort:
    def __call__(self, image):
        im = image.copy()
        im = _random_brightness(im)
        contrast_first = bool(random.randint(2))
        if contrast_first:
            im = _random_contrast(im)
        im = cv2.cvtColor(im, cv2.COLOR_BGR2HSV)
        im = _random_saturation(im)
        im = _random_hue(im)
        im = cv2.cvtColor(im, cv2.COLOR_HSV2BGR)
        if not contrast_first:
            im = _random_contrast(im)
        return _random_lighting_noise(im)


# --------------------------------------------------------------------------
# Box-aware SSD chain (pd.py:9-374,400-416) — unused by the KITTI recipe.
# Every transform is `(image, boxes, labels) -> (image, boxes, labels)` with
# boxes in xyxy; stateless ones ignore/pass through boxes and labels.
# --------------------------------------------------------------------------


def intersect(box_a, box_b):
    """Pairwise [N] intersection areas of boxes [N, 4] with one box [4]
    (pd.py:9-14)."""
    max_xy = np.minimum(box_a[:, 2:], box_b[2:])
    min_xy = np.maximum(box_a[:, :2], box_b[:2])
    inter = np.clip(max_xy - min_xy, a_min=0, a_max=np.inf)
    return inter[:, 0] * inter[:, 1]


def jaccard_numpy(box_a, box_b):
    """IoU of boxes [N, 4] vs one box [4] (pd.py:16-33)."""
    inter = intersect(box_a, box_b)
    area_a = (box_a[:, 2] - box_a[:, 0]) * (box_a[:, 3] - box_a[:, 1])
    area_b = (box_b[2] - box_b[0]) * (box_b[3] - box_b[1])
    return inter / (area_a + area_b - inter)


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, img, boxes=None, labels=None):
        for t in self.transforms:
            img, boxes, labels = t(img, boxes, labels)
        return img, boxes, labels


class Lambda:
    def __init__(self, fn):
        self.fn = fn

    def __call__(self, img, boxes=None, labels=None):
        return self.fn(img, boxes, labels)


class ConvertFromInts:
    def __call__(self, image, boxes=None, labels=None):
        return image.astype(np.float32), boxes, labels


class SubtractMeans:
    def __init__(self, mean):
        self.mean = np.array(mean, dtype=np.float32)

    def __call__(self, image, boxes=None, labels=None):
        return image.astype(np.float32) - self.mean, boxes, labels


class ToAbsoluteCoords:
    def __call__(self, image, boxes=None, labels=None):
        height, width, _ = image.shape
        boxes = boxes * np.array([width, height, width, height], np.float32)
        return image, boxes, labels


class ToPercentCoords:
    def __call__(self, image, boxes=None, labels=None):
        height, width, _ = image.shape
        boxes = boxes / np.array([width, height, width, height], np.float32)
        return image, boxes, labels


class Resize:
    def __init__(self, size=300):
        self.size = size

    def __call__(self, image, boxes=None, labels=None):
        return cv2.resize(image, (self.size, self.size)), boxes, labels


class BoxedTransform:
    """Adapter: lift an image-only function into the (img, boxes, labels)
    protocol."""

    def __init__(self, fn):
        self.fn = fn

    def __call__(self, image, boxes=None, labels=None):
        return self.fn(image), boxes, labels


class RandomSampleCrop:
    """Sample a crop whose IoU with the gt boxes satisfies a randomly chosen
    constraint; keep boxes whose centers fall inside, clipped and shifted to
    the crop (pd.py:208-309).  Shape-changing — host-side use only."""

    SAMPLE_OPTIONS = (None, (0.1, None), (0.3, None), (0.7, None),
                      (0.9, None), (None, None))

    def __call__(self, image, boxes=None, labels=None):
        height, width, _ = image.shape
        while True:
            mode = self.SAMPLE_OPTIONS[random.randint(len(self.SAMPLE_OPTIONS))]
            if mode is None:
                return image, boxes, labels
            min_iou = mode[0] if mode[0] is not None else float("-inf")
            max_iou = mode[1] if mode[1] is not None else float("inf")

            for _ in range(50):
                w = random.uniform(0.3 * width, width)
                h = random.uniform(0.3 * height, height)
                if h / w < 0.5 or h / w > 2:
                    continue
                left = random.uniform(width - w)
                top = random.uniform(height - h)
                rect = np.array(
                    [int(left), int(top), int(left + w), int(top + h)])

                overlap = jaccard_numpy(boxes, rect)
                if overlap.min() < min_iou and max_iou < overlap.max():
                    continue

                centers = (boxes[:, :2] + boxes[:, 2:]) / 2.0
                mask = ((rect[0] < centers[:, 0]) & (rect[1] < centers[:, 1])
                        & (rect[2] > centers[:, 0]) & (rect[3] > centers[:, 1]))
                if not mask.any():
                    continue

                cur_image = image[rect[1]:rect[3], rect[0]:rect[2], :]
                cur_boxes = boxes[mask].copy()
                cur_labels = labels[mask]
                cur_boxes[:, :2] = np.maximum(cur_boxes[:, :2], rect[:2]) - rect[:2]
                cur_boxes[:, 2:] = np.minimum(cur_boxes[:, 2:], rect[2:]) - rect[:2]
                return cur_image, cur_boxes, cur_labels


class Expand:
    """Paste the image at a random offset onto a mean-filled canvas up to 4x
    larger (pd.py:312-337).  Shape-changing — host-side use only."""

    def __init__(self, mean):
        self.mean = mean

    def __call__(self, image, boxes=None, labels=None):
        if random.randint(2):
            return image, boxes, labels
        height, width, depth = image.shape
        ratio = random.uniform(1, 4)
        left = random.uniform(0, width * ratio - width)
        top = random.uniform(0, height * ratio - height)

        canvas = np.empty((int(height * ratio), int(width * ratio), depth),
                          dtype=image.dtype)
        canvas[:, :, :] = self.mean
        canvas[int(top):int(top + height), int(left):int(left + width)] = image

        boxes = boxes.copy()
        boxes[:, :2] += (int(left), int(top))
        boxes[:, 2:] += (int(left), int(top))
        return canvas, boxes, labels


class RandomMirror:
    def __call__(self, image, boxes=None, labels=None):
        _, width, _ = image.shape
        if random.randint(2):
            image = image[:, ::-1]
            boxes = boxes.copy()
            boxes[:, 0::2] = width - boxes[:, 2::-2]
        return image, boxes, labels


class SwapChannels:
    def __init__(self, swaps):
        self.swaps = swaps

    def __call__(self, image):
        return image[:, :, self.swaps]


class SSDAugmentation:
    """The full composed SSD train-time pipeline (pd.py:400-416)."""

    def __init__(self, size=300, mean=(104, 117, 123)):
        self.augment = Compose([
            ConvertFromInts(),
            ToAbsoluteCoords(),
            BoxedTransform(PhotometricDistort()),
            Expand(mean),
            RandomSampleCrop(),
            RandomMirror(),
            ToPercentCoords(),
            Resize(size),
            SubtractMeans(mean),
        ])

    def __call__(self, img, boxes, labels):
        return self.augment(img, boxes, labels)
