from orbslam3_tpu.place.vocab import Vocabulary, build_vocabulary
from orbslam3_tpu.place.database import KeyFrameDatabase
