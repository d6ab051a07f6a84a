#!/usr/bin/env python
"""Minimal HTTP inference server.

The TPU-deployment counterpart of the reference's TorchServe packaging
(``docker/serve/`` + ``tools/deployment/mmdet2torchserve.py`` — SURVEY.md
§2.4 Docker/serving row): POST an image to ``/predict``, get JSON
detections. The jitted predict step is compiled once at startup; requests
are served single-flight (one chip).

Usage:
  python tools/serve.py CONFIG [CHECKPOINT] [--port 8080] [--score-thr 0.3]
  curl -X POST --data-binary @demo.jpg localhost:8080/predict
"""

import argparse
import json
import os.path as osp
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import cv2


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--score-thr", type=float, default=0.3)
    args = p.parse_args()

    from dsl_tpu.apis.inference import inference_detector, init_detector
    from dsl_tpu.data.datasets.coco import COCO_CLASSES

    bundle = init_detector(args.config, args.checkpoint)
    num_classes = bundle.cfg.model["bbox_head"]["num_classes"]
    class_names = (COCO_CLASSES if num_classes == len(COCO_CLASSES)
                   else [str(i) for i in range(num_classes)])

    # warm up the compiled path
    inference_detector(bundle, np.zeros((64, 64, 3), np.uint8))
    print(f"model ready; serving on :{args.port}")

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path not in ("/predict", "/"):
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            img = cv2.imdecode(np.frombuffer(data, np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                self.send_error(400, "cannot decode image")
                return
            result = inference_detector(bundle, img)
            out = []
            for cls_idx, dets in enumerate(result):
                for x1, y1, x2, y2, score in dets:
                    if score < args.score_thr:
                        continue
                    out.append(dict(bbox=[float(x1), float(y1), float(x2),
                                          float(y2)],
                                    score=float(score),
                                    label=int(cls_idx),
                                    class_name=str(class_names[cls_idx])))
            body = json.dumps(dict(detections=out)).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"ok")
            else:
                self.send_error(404)

        def log_message(self, fmt, *a):
            pass

    HTTPServer(("0.0.0.0", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
