"""Augmentation tests: shape preservation, mask label integrity, factory."""

import numpy as np

from segfusion_tpu.data.augmentations import (Compose,
                                              get_composed_augmentations)


def _pair(h=40, w=48):
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    mask = rng.randint(0, 5, (h, w)).astype(np.uint8)
    return img, mask


def test_factory_builds_all_known_augs():
    aug = get_composed_augmentations({
        "gamma": 0.2, "hue": 0.1, "brightness": 0.2, "saturation": 0.2,
        "contrast": 0.2, "hflip": 0.5, "vflip": 0.5, "rotate": 10,
        "translate": 4,
    })
    img, mask = _pair()
    out_img, out_mask = aug(img, mask)
    assert out_img.shape == img.shape
    assert out_mask.shape == mask.shape
    assert out_mask.dtype == np.uint8
    # masks stay label-valued (no interpolation blending)
    assert set(np.unique(out_mask)).issubset(set(range(5)))


def test_crop_resizes():
    aug = get_composed_augmentations({"rcrop": 24})
    img, mask = _pair()
    out_img, out_mask = aug(img, mask)
    assert out_img.shape == (24, 24, 3)
    assert out_mask.shape == (24, 24)


def test_geometric_transforms_keep_pairing():
    # a distinctive mask pattern must move with the image under flips
    img = np.zeros((16, 16, 3), np.float32)
    img[:, :8] = 255.0
    mask = np.zeros((16, 16), np.uint8)
    mask[:, :8] = 1
    from segfusion_tpu.data.augmentations import RandomHorizontallyFlip
    aug = Compose([RandomHorizontallyFlip(p=1.0)])
    out_img, out_mask = aug(img, mask)
    assert out_img[0, 0, 0] == 0 and out_img[0, -1, 0] == 255
    assert out_mask[0, 0] == 0 and out_mask[0, -1] == 1


def test_none_config_returns_none():
    assert get_composed_augmentations(None) is None
    assert get_composed_augmentations({}) is None
