"""Print the host's current steal rate over a short window.

Usage: python scripts/steal_probe.py [seconds]

Prints one line: steal_pct = steal / (user+system+steal+idle advance)
over the window, plus a fixed-work jvm-free CPU probe (python hash
loop) for a second opinion.  On this microVM host, neighbor load shows
up as steal; any bench/profile number taken while steal_pct is high is
environment, not code (OPTIMIZATION_r17.md methodology).
"""
import sys, time

def snap():
    with open("/proc/stat") as f:
        p = f.readline().split()
    # user nice system idle iowait irq softirq steal
    return int(p[1]), int(p[3]), int(p[8])

w = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
u0, i0, s0 = snap()
t0 = time.perf_counter()
acc = 0
n = 0
while time.perf_counter() - t0 < w:
    for i in range(200_000):
        acc ^= hash((i * 2654435761) & 0xFFFFFFFF)
    n += 1
loop_sec = (time.perf_counter() - t0) / n
u1, i1, s1 = snap()
du, di, ds = u1 - u0, i1 - i0, s1 - s0
tot = du + di + ds
print(f"steal_pct={100.0 * ds / max(tot, 1):.1f} user={du/100:.1f}s idle={di/100:.1f}s steal={ds/100:.1f}s window={w:.0f}s py200k={loop_sec*1000:.0f}ms")
