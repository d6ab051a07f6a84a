#!/bin/bash
# TPU serving entrypoint (reference: docker/serve/entrypoint.sh, which
# launches torchserve). Here `serve` starts tools/serve.py on the model
# named in config.properties.
set -e

PROPS=${PROPS:-/srv/config.properties}
prop() { grep "^$1=" "$PROPS" | cut -d= -f2-; }

if [[ "$1" = "serve" ]]; then
    shift 1
    exec python /workspace/tools/serve.py "$(prop config)" \
        "$(prop checkpoint)" --port 8080 --score-thr "$(prop score_thr)"
else
    eval "$@"
fi
