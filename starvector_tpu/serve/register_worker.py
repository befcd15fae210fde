"""Manually register a worker with the controller (reference:
starvector/serve/register_worker.py:12-26)."""

import argparse

import requests


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--controller-address", required=True)
    parser.add_argument("--worker-name", required=True)
    parser.add_argument("--check-heart-beat", action="store_true")
    args = parser.parse_args()

    status = requests.post(
        args.worker_name + "/worker_get_status", timeout=10
    ).json()
    r = requests.post(
        args.controller_address + "/register_worker",
        json={
            "worker_name": args.worker_name,
            "check_heart_beat": args.check_heart_beat,
            "worker_status": status,
        },
        timeout=10,
    )
    assert r.status_code == 200, r.text
    print("registered:", args.worker_name)


if __name__ == "__main__":
    main()
