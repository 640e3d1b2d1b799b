from kmbart_tpu.vision.nms import nms, class_wise_max_conf  # noqa: F401
from kmbart_tpu.vision.roi import roi_align, roi_pool  # noqa: F401
from kmbart_tpu.vision.extractor import FeatureExtractor  # noqa: F401
