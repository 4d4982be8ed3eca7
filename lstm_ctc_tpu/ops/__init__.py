from .ctc import ctc_loss
from .decode import greedy_decode, edit_distance_batch
