"""Dataset frontend: g2o/TORO/SLAM++ parser, parse loop, synthetic generators
(reference layer L8: include/slam/Parser.h, slam_app/ParsePrimitives.h)."""

from slampp_tpu.io.parser import parse_file, detect_problem, build_system, ParsedRecord
