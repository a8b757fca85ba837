"""Local multi-process (pod-simulation) launcher.

Reference parity: none — the reference is single-process (SURVEY.md §2.5).
On a real TPU pod each host runs the same program with cluster metadata from
the platform launcher. For local development and CI there is no such
launcher, so this tool is the missing piece: it spawns N copies of a
command, wiring the `parallel.multihost.bootstrap` env-var contract
(EVR_TPU_COORDINATOR / EVR_TPU_NUM_PROCESSES / EVR_TPU_PROCESS_ID) plus,
with ``--cpu-devices``, a virtual CPU device count per process — the exact
topology `tests/test_multihost.py` validates (one process per "host", Gloo
TCP collectives).

Examples::

    # 2 simulated hosts x 4 virtual CPU chips, multi-host fine-tune
    python -m evr_tpu.tools.pod_launch -n 2 --cpu-devices 4 -- \
        python -m evr_tpu.tools.finetune --train-json a.json --data-dir d/

Exit status is non-zero if ANY worker fails; on the first failure the
remaining workers are terminated (a half-dead pod would hang in its next
collective anyway).
"""

from __future__ import annotations

import argparse
import os
import signal
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch(
    cmd: list[str],
    num_processes: int,
    cpu_devices: int | None = None,
    coordinator_port: int | None = None,
    prefix_output: bool = True,
) -> int:
    """Spawn ``cmd`` ``num_processes`` times with the multihost env contract;
    returns the first non-zero return code (0 if all succeed)."""
    port = coordinator_port or _free_port()
    procs: list[subprocess.Popen] = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env.update(
            EVR_TPU_COORDINATOR=f"localhost:{port}",
            EVR_TPU_NUM_PROCESSES=str(num_processes),
            EVR_TPU_PROCESS_ID=str(pid),
        )
        if cpu_devices:
            env["JAX_PLATFORMS"] = "cpu"
            # drop any inherited device-count flag (last occurrence wins in
            # XLA, so an inherited one would silently override ours)
            inherited = [
                f for f in env.get("XLA_FLAGS", "").split()
                if not f.startswith("--xla_force_host_platform_device_count")
            ]
            env["XLA_FLAGS"] = " ".join(
                inherited + [f"--xla_force_host_platform_device_count={cpu_devices}"]
            )
        procs.append(
            subprocess.Popen(
                cmd,
                env=env,
                stdout=subprocess.PIPE if prefix_output else None,
                stderr=subprocess.STDOUT if prefix_output else None,
                text=prefix_output,
            )
        )

    rc = 0
    if prefix_output:
        import threading

        def pump(pid: int, p: subprocess.Popen) -> None:
            for line in p.stdout:  # type: ignore[union-attr]
                sys.stdout.write(f"[proc {pid}] {line}")
                sys.stdout.flush()

        threads = [
            threading.Thread(target=pump, args=(i, p), daemon=True)
            for i, p in enumerate(procs)
        ]
        for t in threads:
            t.start()
    try:
        remaining = set(range(num_processes))
        while remaining:
            for i in list(remaining):
                code = procs[i].poll()
                if code is None:
                    continue
                remaining.discard(i)
                if code != 0 and rc == 0:
                    rc = code
                    # a dead rank wedges every later collective: stop the pod
                    for j in remaining:
                        procs[j].terminate()
            if remaining:
                import time

                time.sleep(0.1)
    except KeyboardInterrupt:
        for p in procs:
            p.send_signal(signal.SIGTERM)
        rc = 130
    for p in procs:
        p.wait()
    return rc


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="spawn N multihost worker processes locally",
        usage="python -m evr_tpu.tools.pod_launch -n N [--cpu-devices K] -- CMD...",
    )
    ap.add_argument("-n", "--num-processes", type=int, required=True)
    ap.add_argument(
        "--cpu-devices", type=int, default=None,
        help="force JAX_PLATFORMS=cpu with this many virtual devices per "
        "process (pod simulation); omit on real TPU hosts",
    )
    ap.add_argument("--port", type=int, default=None, help="coordinator port")
    ap.add_argument("--no-prefix", action="store_true",
                    help="inherit stdout instead of '[proc N]'-prefixed lines")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="command to run (prefix with --)")
    args = ap.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (use: pod_launch -n 2 -- python ...)")
    raise SystemExit(
        launch(cmd, args.num_processes, args.cpu_devices, args.port,
               prefix_output=not args.no_prefix)
    )


if __name__ == "__main__":
    main()
