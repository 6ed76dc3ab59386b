#!/bin/sh
##
##  LSB-style service wrapper for the data_wrangler_spark gateway —
##  the Spark-native mirror of the reference's forever-supervised
##  init script (/root/reference/iqdatawrangler.init.d):
##    start_server  → reference: `forever start -o $TS.output.log
##                    -e $TS.error.log index.js`; here: nohup the
##                    foreground app (python -m
##                    data_wrangler_spark.serve) with the same
##                    timestamped log pair, pid recorded by the app.
##    running()     → reference greps `forever list`; here: pidfile
##                    + kill -0 (no supervisor daemon to ask).
##    stop_server   → reference: `forever stop`; here: SIGTERM, the
##                    app shuts the HTTP server and SparkSession
##                    down and removes its pidfile.
##    STARTTIME     → the reference SLEEPS and re-greps; here the
##                    app writes its bound URL to a ready-file once
##                    listening, so start waits on a positive signal
##                    (and port 0 / --debug ports are reported, not
##                    guessed).
##    DIETIME       → same: bounded wait for a clean exit on stop.
##
## Configuration (environment, with reference-shaped defaults):
##   DW_DIR      app directory            (default /root/repo)
##   DW_LOGDIR   log + run-state dir      (default $DW_DIR/.scratch/service)
##   DW_SF_DIR   served table directory   (default engine default)
##   DW_PORT     listen port              (default 4400, config.json:3)
##   DW_PYTHON   python interpreter       (default python3)
##
# chkconfig:   345 85 15
# description: Startup script for the data_wrangler_spark gateway.

DESC="Data Wrangler Spark"
DIR="${DW_DIR:-/root/repo}"
LOGDIR="${DW_LOGDIR:-$DIR/.scratch/service}"
PIDFILE="$LOGDIR/server.pid"
READYFILE="$LOGDIR/server.url"
PORT="${DW_PORT:-4400}"
PY="${DW_PYTHON:-python3}"

# 60 s: a SparkSession teardown (handler-thread joins + spark.stop())
# routinely exceeds 10 s on a loaded box, and a short wait makes
# `restart` (stop && start) abort with the service down
DIETIME="${DW_DIETIME:-60}"    # seconds to wait for the server to die on stop
STARTTIME="${DW_STARTTIME:-60}"  # seconds to wait for the ready-file on start
              # (a SparkSession boot is the long pole, not Express)

running() {
    [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null
}

start_server() {
    mkdir -p "$LOGDIR"
    rm -f "$READYFILE"
    TS=$(date +%s)
    OLOG="$LOGDIR/$TS.output.log"
    ELOG="$LOGDIR/$TS.error.log"
    cd "$DIR" || return 1
    nohup "$PY" -m data_wrangler_spark.serve \
        ${DW_SF_DIR:+--sf-dir "$DW_SF_DIR"} \
        --port "$PORT" \
        --pidfile "$PIDFILE" \
        --ready-file "$READYFILE" \
        >"$OLOG" 2>"$ELOG" &
    WRAPPED=$!
    n=0
    while [ "$n" -lt "$STARTTIME" ]; do
        [ -f "$READYFILE" ] && return 0
        kill -0 "$WRAPPED" 2>/dev/null || return 1  # died during boot
        sleep 1
        n=$((n + 1))
    done
    return 1
}

stop_server() {
    [ -f "$PIDFILE" ] || return 0
    kill "$(cat "$PIDFILE")" 2>/dev/null
    n=0
    while [ "$n" -lt "$DIETIME" ]; do
        running || return 0
        sleep 1
        n=$((n + 1))
    done
    return 1
}

case "$1" in
    start)
        if running; then
            echo "$DESC already running (pid $(cat "$PIDFILE"))"
            exit 0
        fi
        echo "Starting $DESC"
        if start_server && running; then
            echo "$DESC started at $(cat "$READYFILE")"
            exit 0
        fi
        echo "$DESC failed to start (see $LOGDIR)" >&2
        exit 1
        ;;
    stop)
        if ! running; then
            echo "$DESC not running"
            exit 0
        fi
        echo "Stopping $DESC"
        if stop_server; then
            echo "$DESC stopped"
            exit 0
        fi
        echo "$DESC did not stop within ${DIETIME}s" >&2
        exit 1
        ;;
    restart|force-reload)
        "$0" stop && exec "$0" start
        ;;
    status)
        if running; then
            echo "$DESC running (pid $(cat "$PIDFILE"), $(cat "$READYFILE" 2>/dev/null))"
            exit 0
        fi
        echo "$DESC not running"
        exit 3
        ;;
    *)
        echo "Usage: $0 {start|stop|restart|force-reload|status}" >&2
        exit 2
        ;;
esac
