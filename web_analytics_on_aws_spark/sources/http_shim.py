"""HTTP ingest shim — parity with the reference's API Gateway record APIs
(SURVEY §2.1 S1-S4; /root/reference/web-analytics-parquet/cdk_stacks/
apigw.py:141-238 and the Firehose-direct variant).

A stdlib-only HTTP server exposing the reference's REST surface over a
landing directory (the durable buffer, ≅ the Kinesis stream S5):

  PUT  /streams/{name}/record    {"data": <json-str>, "partition-key": k}
  PUT  /streams/{name}/records   {"records": [{"data": ..., "partition-key": k}, ...]}
  GET  /streams                  list stream names (≅ ListStreams, S3)
  GET  /streams/{name}           stream description (≅ DescribeStream, S3)

Each PUT appends JSON-lines to ``{base_dir}/{stream}/`` as one file per
request (≅ one PutRecords call → one buffered flush); the Structured
Streaming ingest (streaming/ingest_stream.py) tails that directory. The
partition key's shard-routing role is subsumed by Spark's own partitioning
(SURVEY §2.1 S1 note) — we record it but don't route on it.

No auth, permissive CORS — faithfully mirroring the reference's posture
(authorization_type=NONE, ALL_ORIGINS; apigw.py:91,177,230 — noted there as
"for demo", not a recommendation).
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _Handler(BaseHTTPRequestHandler):
    base_dir: str = "."

    def log_message(self, *args) -> None:  # quiet
        pass

    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _append(self, stream: str, datas: list[str]) -> None:
        d = os.path.join(self.base_dir, stream)
        os.makedirs(d, exist_ok=True)
        fname = os.path.join(d, f"put-{time.time_ns()}-{uuid.uuid4().hex[:8]}.jsonl")
        with open(fname, "w") as f:
            for data in datas:
                # JSON → JSON-Lines normalization (P4): exactly one trailing
                # newline per record (schema_validator.py:127)
                f.write(data.rstrip("\n") + "\n")

    def do_GET(self) -> None:
        parts = [p for p in self.path.split("/") if p]
        if parts == ["streams"]:
            streams = sorted(
                n for n in os.listdir(self.base_dir)
                if os.path.isdir(os.path.join(self.base_dir, n))
            )
            self._send(200, {"StreamNames": streams})
        elif len(parts) == 2 and parts[0] == "streams":
            d = os.path.join(self.base_dir, parts[1])
            if not os.path.isdir(d):
                self._send(404, {"message": f"stream {parts[1]} not found"})
                return
            files = os.listdir(d)
            self._send(
                200,
                {
                    "StreamDescription": {
                        "StreamName": parts[1],
                        "StreamStatus": "ACTIVE",
                        "Files": len(files),
                    }
                },
            )
        else:
            self._send(404, {"message": "not found"})

    def do_PUT(self) -> None:
        parts = [p for p in self.path.split("/") if p]
        length = int(self.headers.get("Content-Length", 0))
        try:
            body = json.loads(self.rfile.read(length) or b"{}")
        except json.JSONDecodeError:
            self._send(400, {"message": "malformed JSON body"})
            return
        if len(parts) == 3 and parts[0] == "streams" and parts[2] == "record":
            self._append(parts[1], [str(body.get("data", ""))])
            self._send(200, {"SequenceNumber": "1", "ShardId": "shardId-0"})
        elif len(parts) == 3 and parts[0] == "streams" and parts[2] == "records":
            datas = [str(r.get("data", "")) for r in body.get("records", [])]
            self._append(parts[1], datas)
            self._send(200, {"FailedRecordCount": 0, "Records": [{} for _ in datas]})
        else:
            self._send(404, {"message": "not found"})


class IngestShim:
    """Threaded HTTP shim over a landing directory."""

    def __init__(self, base_dir: str, host: str = "127.0.0.1", port: int = 0):
        handler = type("BoundHandler", (_Handler,), {"base_dir": base_dir})
        self.server = ThreadingHTTPServer((host, port), handler)
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)

    @property
    def url(self) -> str:
        host, port = self.server.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "IngestShim":
        self.thread.start()
        return self

    def stop(self) -> None:
        self.server.shutdown()
        self.server.server_close()
