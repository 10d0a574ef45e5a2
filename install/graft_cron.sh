#!/bin/sh
# Daily cron target - the reference's install/etl_cron_job re-expressed
# for graft: run all scheduled jobs, log to the metadata dir.
# Example crontab: 15 2 * * * /opt/graft/install/graft_cron.sh
GRAFT_HOME="${GRAFT_HOME:-/opt/graft}"
GRAFT_META_DIR="${GRAFT_META_DIR:-$GRAFT_HOME/meta}"
LOG="$GRAFT_META_DIR/cron_$(date +%Y%m%d).log"
mkdir -p "$GRAFT_META_DIR"
cd "$GRAFT_HOME" || exit 1
exec sbt -batch "runMain graft.Cli run-scheduled" >>"$LOG" 2>&1
