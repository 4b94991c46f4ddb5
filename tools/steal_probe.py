"""Print steal/busy jiffies over a short window — run before trusting
any timing window. Usage: python tools/steal_probe.py [seconds=10]"""
import sys, time

def read():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return v

secs = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
a = read(); time.sleep(secs); b = read()
d = [y - x for x, y in zip(a, b)]
total = sum(d[:8])
print({"steal": d[7], "busy": sum(d[i] for i in (0,1,2,5,6)),
       "idle": d[3], "total": total,
       "steal_pct": round(100*d[7]/total, 2)})
