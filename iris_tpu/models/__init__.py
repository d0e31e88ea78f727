from iris_tpu.models import brdf, crf, emitter, emor, hashgrid, mlp, slf
