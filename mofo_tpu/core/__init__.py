from mofo_tpu.core import constants
