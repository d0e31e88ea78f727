from iris_tpu.core import vecmath, ggx, interp
