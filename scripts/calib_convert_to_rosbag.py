"""Pack a recorded calibration session into a rosbag for basalt_calibrate.

Parity: /root/reference/tandem/scripts/calib_convert_to_rosbag.py — reads
``timestamps_sec.txt`` + ``images/%06d.png`` (the layout
cli/tandem_demo ``record=`` produces) and writes mono8 Image messages on
``cam0/image_raw`` stamped relative to the first frame.

Requires a ROS environment (rospy/rosbag), which this image does not ship —
the import is gated with a clear message; the session-recorder side
(pipeline/camera.py record=) is covered by tests, and the txt converter
(calib_convert_to_txt.py) closes the loop back from basalt's output.

Usage: python scripts/calib_convert_to_rosbag.py TANDEM_CALIB_DIR
"""

import sys


def main(path):
    try:
        import rosbag
        import rospy
        from sensor_msgs.msg import Image
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            f"ROS not available ({e}); run inside a ROS environment "
            "(this script only packages the recorded session for "
            "basalt_calibrate)")
    import cv2
    import numpy as np

    ts = np.loadtxt(f"{path}/timestamps_sec.txt")
    ts = ts - ts[0]
    n = ts.size
    print(f"Mean dt={int(1000 * np.mean(np.diff(ts)))} ms")

    with rosbag.Bag(f"{path}/calib.bag", "w") as bag:
        for i in range(n):
            img = cv2.imread(f"{path}/images/{i:06d}.png",
                             cv2.IMREAD_GRAYSCALE)
            assert img is not None and img.dtype == np.uint8, f"frame {i}"
            stamp = rospy.Time(secs=int(ts[i]),
                               nsecs=int(1e9 * (ts[i] % 1)))
            msg = Image()
            msg.header.stamp = stamp
            msg.height, msg.width = img.shape
            msg.encoding = "mono8"
            msg.step = img.shape[1]
            msg.data = img.tobytes()
            bag.write("cam0/image_raw", msg, stamp)
    print(f"wrote {path}/calib.bag ({n} frames)")


if __name__ == "__main__":
    assert len(sys.argv) == 2, (
        "Call like python calib_convert_to_rosbag.py TANDEM_CALIB_DIR")
    main(sys.argv[1])
