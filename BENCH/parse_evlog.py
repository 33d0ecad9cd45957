import sys, json, glob, os
import pyarrow as pa

def parse(logdir):
    files = sorted(glob.glob(os.path.join(logdir, 'events_*')))
    stages = {}   # (stageId, attempt) -> dict
    tasks = {}    # stageId -> [task runtimes ms]
    jobs = {}     # jobId -> stage ids
    for f in files:
        stream = pa.input_stream(f, compression='zstd') if f.endswith('.zstd') else open(f,'rb')
        for line in stream.readall().decode().splitlines() if hasattr(stream,'readall') else stream:
            try: ev = json.loads(line)
            except: continue
            t = ev.get('Event')
            if t == 'SparkListenerJobStart':
                jobs[ev['Job ID']] = [s['Stage ID'] for s in ev['Stage Infos']]
            elif t == 'SparkListenerStageCompleted':
                si = ev['Stage Info']
                sid = si['Stage ID']
                stages[sid] = dict(
                    name=si['Stage Name'].split(' at ')[0],
                    sub=si['Stage Name'],
                    ntask=si['Number of Tasks'],
                    wall=(si.get('Completion Time',0)-si.get('Submission Time',0))/1e3)
            elif t == 'SparkListenerTaskEnd':
                sid = ev['Stage ID']
                tm = ev.get('Task Metrics') or {}
                tasks.setdefault(sid, []).append(tm.get('Executor Run Time',0)/1e3)
    return jobs, stages, tasks

logdir, cores, lastn = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
jobs, stages, tasks = parse(logdir)
last_jobs = sorted(jobs)[-lastn:]
tot_wall = tot_task = 0.0
print(f"== last {lastn} job(s), cores={cores} ==")
for j in last_jobs:
    for sid in sorted(jobs[j]):
        if sid not in stages: continue
        st = stages[sid]
        ts = tasks.get(sid, [])
        tsum = sum(ts); wall = st['wall']
        tot_wall += wall; tot_task += tsum
        util = tsum/(wall*cores) if wall>0 else 0
        mx = max(ts) if ts else 0
        print(f"job{j} stage{sid:3d} {st['name'][:40]:40s} ntask={st['ntask']:4d} wall={wall:7.2f}s tasksum={tsum:8.2f}s util={util:5.2f} maxtask={mx:6.2f}s")
print(f"TOTAL stage-wall={tot_wall:.2f}s tasksum={tot_task:.2f}s overall-util={tot_task/(tot_wall*cores):.3f}")
