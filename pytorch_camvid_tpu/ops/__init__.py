"""TPU-native compute ops: the XLA/Pallas equivalents of every native
(cuDNN/OpenCV/sklearn) kernel the reference delegates to (SURVEY.md §2.4)."""

from pytorch_camvid_tpu.ops.initializers import (  # noqa: F401
    conv_kernel_init, conv_bias_init)
from pytorch_camvid_tpu.ops.conv import (  # noqa: F401
    conv2d, conv_bn_relu_init, conv_bn_relu_apply)
from pytorch_camvid_tpu.ops.pooling import (  # noqa: F401
    max_pool_2x2, max_pool_2x2_with_argmax, max_unpool_2x2,
    max_pool_2x2_with_phase, max_unpool_2x2_from_phase, phase_to_flat_index)
from pytorch_camvid_tpu.ops.resize import (  # noqa: F401
    upsample2x_bilinear_align_corners, resize_bilinear_cv2, resize_nearest_cv2)
from pytorch_camvid_tpu.ops.loss import cross_entropy_loss  # noqa: F401
from pytorch_camvid_tpu.ops.metrics import (  # noqa: F401
    confusion_matrix, intersect_and_union_areas, iou_from_confusion,
    accuracy_from_confusion, precision_recall_from_confusion)
from pytorch_camvid_tpu.ops.pallas_conv import (  # noqa: F401
    conv3x3_bn_relu_pallas, conv_bn_relu_apply_pallas)
from pytorch_camvid_tpu.ops.pallas_pool import (  # noqa: F401
    max_pool_2x2_argmax_pallas, max_unpool_2x2_pallas)
from pytorch_camvid_tpu.ops.pallas_conv_train import (  # noqa: F401
    conv3x3_pallas)
