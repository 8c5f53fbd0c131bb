from .coarse_tracker import (CoarseTrackerRef, make_tracker_ref, track_frame,
                             splat_depth_to_ref)
