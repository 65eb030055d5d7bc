"""Shared HX4 dataset helpers. Port of /root/reference/projects/
maastro_hx4_pet_translation/datasets/utils/basic.py to the TPU framework
(numpy data plane; no torch)."""

import numpy as np

from ganslate_tpu.data.utils.body_mask import get_body_mask
from ganslate_tpu.data.utils.normalization import min_max_normalize
from ganslate_tpu.utils import sitk_utils
from ganslate_tpu.utils.medio import MedicalImage

# Body mask settings.
OUT_OF_BODY_HU = -1024
OUT_OF_BODY_SUV = 0
HU_THRESHOLD = -300


def apply_body_mask(image_dict, generate_body_mask=False):
    """Mask every CT/PET in the dict with the body mask (generated from a CT
    by thresholding when missing). Uses the native masked-fill kernel."""
    from ganslate_tpu import native

    if generate_body_mask:
        assert image_dict['body-mask'] is None
        assert any('CT' in k for k in image_dict)
        ct_image_name = [k for k in image_dict if 'CT' in k][0]
        image_dict['body-mask'] = get_body_mask(image_dict[ct_image_name], HU_THRESHOLD)

    assert image_dict['body-mask'] is not None
    body_mask = image_dict['body-mask']
    for k in image_dict:
        if 'PET' in k:
            image_dict[k] = native.masked_fill(image_dict[k], body_mask,
                                               OUT_OF_BODY_SUV)
        elif 'CT' in k:
            image_dict[k] = native.masked_fill(image_dict[k], body_mask,
                                               OUT_OF_BODY_HU)
    return image_dict


def clip_and_min_max_normalize(array, min_value, max_value):
    from ganslate_tpu.data.utils.normalization import clip_and_min_max_normalize \
        as clip_norm
    return clip_norm(array, min_value, max_value)


def sitk2np(image_dict):
    """MedicalImage values -> (D, H, W) numpy arrays."""
    for k in image_dict:
        if isinstance(image_dict[k], MedicalImage):
            image_dict[k] = sitk_utils.get_npy(image_dict[k])
    return image_dict
