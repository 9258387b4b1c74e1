#!/bin/bash
# Round-5 scaling harness (VERDICT r4 next-round item 4): one more
# corpus doubling (9.6M docs) under the same directly-measured
# mid-leg co-tenant-CPU gate as round 4. The r4 summary sat at 0.814
# (4.8M docs); the fitted serial-constant model predicts ~0.85+ here.
# Mechanics unchanged from scaling_r4.sh:
# gate could not see co-tenant bursts that started MID-leg (accepted
# pairs spread 0.20-1.06). This version gates each leg on directly
# measured CO-TENANT CPU during the leg:
#
#   other_cpu = (Δbusy jiffies from /proc/stat)/CLK_TCK − our child's
#               (user+sys) from bash `time`
#   other_cores = other_cpu / wallclock      → accept iff < OTHERGATE
#
# loadavg cannot make that split (our local[32] leg dominates it); the
# jiffy ledger can, at any point in the leg, because it is an integral
# over the whole leg rather than a 1-min EWMA snapshot.
#
# Legs run interleaved A/B A/B ... (8-core, 32-core alternating) so a
# slow drift hits both sides equally; the summary reports per-leg
# medians and efficiency-of-medians = medT8/(4·medT32) over ACCEPTED
# legs only, plus the accepted-pair spread.
set -u
OUT=${OUT:-/root/repo/BENCH/scaling_r5.jsonl}
DOCS=${DOCS:-600000}
PAIRS=${PAIRS:-3}
GATE=${GATE:-4}          # pre-leg 1-min loadavg gate (cheap first filter)
OTHERGATE=${OTHERGATE:-1.0}  # max co-tenant cores averaged over the leg
TRIALS=${TRIALS:-2}
cd /root/repo
mkdir -p /dev/shm/spark-local "$(dirname "$OUT")"
HZ=$(getconf CLK_TCK)
gt() { awk -v a="$1" -v b="$2" 'BEGIN{exit !(a>b)}'; }
busy() { awk '/^cpu /{print $2+$3+$4+$7+$8+$9}' /proc/stat; }
tosec() { # "3m12.456s" -> seconds
  echo "$1" | awk -F'[ms]' '{print $1*60+$2}'
}

run_leg() { # $1 = cpus; echoes "millis other_cores" or "FAIL reason"
  local c=$1 l0 b0 t0 b1 t1 wall own other line waited
  # wait (bounded) for the 1-min loadavg to decay below GATE — after
  # our own previous leg the EWMA needs ~60-120 s to fall; only fail
  # if it stays high (a real co-tenant burst)
  waited=0
  while :; do
    l0=$(cut -d' ' -f1 /proc/loadavg)
    gt "$l0" "$GATE" || break
    sleep 30; waited=$((waited+30))
    if [ $waited -ge 600 ]; then echo "FAIL preload=$l0"; return; fi
  done
  b0=$(busy); t0=$(date +%s.%N)
  { time (SPARK_LOCAL_DIRS=/dev/shm/spark-local SPARK_DRIVER_MEM=${MEM:-48g} \
      SPARK_GRAFT_CPUS=$c SPARK_GRAFT_TRIALS=$TRIALS \
      sbt -batch "runMain graft.tools.BuildProfile $DOCS" \
      >/tmp/scaling_leg.out 2>/dev/null) ; } 2>/tmp/scaling_leg.time
  t1=$(date +%s.%N); b1=$(busy)
  wall=$(awk -v a="$t0" -v b="$t1" 'BEGIN{printf "%.2f", b-a}')
  own=$(awk -v u="$(tosec "$(awk '/^user/{print $2}' /tmp/scaling_leg.time)")" \
            -v s="$(tosec "$(awk '/^sys/{print $2}' /tmp/scaling_leg.time)")" \
            'BEGIN{printf "%.2f", u+s}')
  other=$(awk -v b0="$b0" -v b1="$b1" -v hz="$HZ" -v own="$own" -v w="$wall" \
    'BEGIN{oc=((b1-b0)/hz-own)/w; if (oc<0) oc=0; printf "%.3f", oc}')
  line=$(grep -oE 'BEST [0-9.]+' /tmp/scaling_leg.out | awk '{printf "%d", $2*1000}')
  if [ -z "$line" ]; then echo "FAIL nobest"; return; fi
  echo "{\"docs\":$DOCS,\"cpus\":$c,\"buildMillis\":$line,\"wall\":$wall,\"own_cpu\":$own,\"other_cores\":$other,\"load0\":$l0}" >> "$OUT"
  if gt "$other" "$OTHERGATE"; then echo "FAIL other=$other"; return; fi
  echo "$line $other"
}

a8=(); a32=(); effs=()
p=0
attempts=0
while [ ${#effs[@]} -lt "$PAIRS" ] && [ $attempts -lt $((PAIRS*4)) ]; do
  attempts=$((attempts+1))
  r8=$(run_leg 8); sleep 30
  r32=$(run_leg 32); sleep 30
  case "$r8 $r32" in
    *FAIL*) echo "{\"pair_attempt\":$attempts,\"rejected\":\"$r8 / $r32\"}" >> "$OUT"; continue;;
  esac
  t8=${r8%% *}; t32=${r32%% *}
  a8+=("$t8"); a32+=("$t32")
  eff=$(awk -v a="$t8" -v b="$t32" 'BEGIN{printf "%.3f", a/(4*b)}')
  effs+=("$eff")
  p=$((p+1))
  echo "{\"pair\":$p,\"t8_ms\":$t8,\"t32_ms\":$t32,\"efficiency\":$eff}" >> "$OUT"
done

if [ ${#effs[@]} -gt 0 ]; then
  med() { printf '%s\n' "$@" | sort -n | awk '{a[NR]=$1} END{print (NR%2) ? a[(NR+1)/2] : (a[NR/2]+a[NR/2+1])/2}'; }
  m8=$(med "${a8[@]}"); m32=$(med "${a32[@]}")
  meff=$(awk -v a="$m8" -v b="$m32" 'BEGIN{printf "%.3f", a/(4*b)}')
  lo=$(printf '%s\n' "${effs[@]}" | sort -n | head -1)
  hi=$(printf '%s\n' "${effs[@]}" | sort -n | tail -1)
  spread=$(awk -v a="$lo" -v b="$hi" 'BEGIN{printf "%.3f", b-a}')
  echo "{\"summary\":\"r5\",\"pairs\":${#effs[@]},\"median_t8_ms\":$m8,\"median_t32_ms\":$m32,\"efficiency_of_medians\":$meff,\"pair_spread\":$spread,\"gate\":\"preload<$GATE, other_cores<$OTHERGATE mid-leg\"}" >> "$OUT"
fi
rm -rf /dev/shm/spark-local
echo DONE >> "$OUT"
