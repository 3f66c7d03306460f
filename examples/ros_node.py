#!/usr/bin/env python
"""ROS1 node adapter (role of the reference's ROS nodes,
`/root/reference/Examples_old/ROS/ORB_SLAM3/src/ros_{mono,mono_inertial,
stereo,stereo_inertial,rgbd}.cc`): subscribe to sensor topics, feed frames
(+ batched IMU, the vImuMeas contract of System.cc:311-313) into the
System facade, publish the current camera pose.

Requires rospy/cv_bridge (not in this image — the node exits with a clear
message when ROS is unavailable; the import is deferred so the rest of the
examples never depend on it).

Usage (on a ROS machine):
  rosrun <pkg> ros_node.py --settings TUM-VI.yaml --sensor mono-imu \
      --image /cam0/image_raw --imu /imu0 [--image-right /cam1/image_raw]
"""

import argparse
import sys
import threading


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--settings", required=True)
    ap.add_argument("--sensor", default="mono",
                    choices=["mono", "stereo", "rgbd",
                             "mono-imu", "stereo-imu"])
    ap.add_argument("--image", default="/camera/image_raw")
    ap.add_argument("--image-right", default=None)
    ap.add_argument("--depth", default=None)
    ap.add_argument("--imu", default="/imu")
    ap.add_argument("--pose-topic", default="/orb_slam3_tpu/pose")
    args = ap.parse_args()

    try:
        import rospy
        from cv_bridge import CvBridge
        from geometry_msgs.msg import PoseStamped
        from sensor_msgs.msg import Image, Imu
    except ImportError:
        sys.exit("ROS not available in this environment: ros_node.py needs "
                 "rospy + cv_bridge (run it inside a ROS1 workspace)")

    import numpy as np

    from orb_slam3_tpu.api import settings as settings_mod, system

    s = settings_mod.load_settings(args.settings, sensor=args.sensor)
    cfg = settings_mod.to_tracker_config(s)
    slam = system.System(config=cfg)
    bridge = CvBridge()
    use_imu = args.sensor.endswith("-imu")
    stereo = args.sensor.startswith("stereo")

    imu_buf = []
    imu_lock = threading.Lock()

    def on_imu(msg: "Imu"):
        # accumulate until the next image (GrabImuData, Tracking.cc:1618)
        row = [msg.header.stamp.to_sec(),
               msg.angular_velocity.x, msg.angular_velocity.y,
               msg.angular_velocity.z,
               msg.linear_acceleration.x, msg.linear_acceleration.y,
               msg.linear_acceleration.z]
        with imu_lock:
            imu_buf.append(row)

    right_buf = {}

    def drain_imu(ts):
        with imu_lock:
            take = [r for r in imu_buf if r[0] <= ts]
            del imu_buf[: len(take)]
        return np.asarray(take) if take else None

    pose_pub = rospy.Publisher(args.pose_topic, PoseStamped, queue_size=2)

    def publish_pose(ts):
        out = slam.current_pose()
        if out is None:
            return
        R, t = out
        import scipy.spatial.transform as sst

        q = sst.Rotation.from_matrix(np.asarray(R).T).as_quat()
        C = -np.asarray(R).T @ np.asarray(t)
        msg = PoseStamped()
        msg.header.stamp = rospy.Time.from_sec(ts)
        msg.header.frame_id = "world"
        msg.pose.position.x, msg.pose.position.y, msg.pose.position.z = C
        (msg.pose.orientation.x, msg.pose.orientation.y,
         msg.pose.orientation.z, msg.pose.orientation.w) = q
        pose_pub.publish(msg)

    def on_image(msg: "Image"):
        ts = msg.header.stamp.to_sec()
        img = bridge.imgmsg_to_cv2(msg, desired_encoding="mono8")
        imu = drain_imu(ts) if use_imu else None
        if stereo:
            r = right_buf.pop("img", None)
            if r is None:
                right_buf["pending"] = (img, ts, imu)
                return
            slam.track_stereo(img, r, ts, imu=imu)
        else:
            slam.track_monocular(img, ts, imu=imu)
        publish_pose(ts)

    def on_image_right(msg: "Image"):
        right_buf["img"] = bridge.imgmsg_to_cv2(msg, desired_encoding="mono8")
        pend = right_buf.pop("pending", None)
        if pend is not None:
            img, ts, imu = pend
            slam.track_stereo(img, right_buf.pop("img"), ts, imu=imu)
            publish_pose(ts)

    rospy.init_node("orb_slam3_tpu")
    rospy.Subscriber(args.image, Image, on_image, queue_size=2)
    if stereo and args.image_right:
        rospy.Subscriber(args.image_right, Image, on_image_right,
                         queue_size=2)
    if use_imu:
        rospy.Subscriber(args.imu, Imu, on_imu, queue_size=200)
    rospy.loginfo("orb_slam3_tpu ROS node up (%s)", args.sensor)
    rospy.spin()
    slam.shutdown()


if __name__ == "__main__":
    main()
