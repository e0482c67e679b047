#!/usr/bin/env bash
exec "$(dirname "$0")/train_all.sh" washing_machine "${1:-./data}"
