#!/bin/bash
# Commit stage artifacts as a batch-script POSTCONDITION (mechanized
# evidence banking — the r4 VM-reset lesson). A killed run leaves every
# completed stage's metrics.json / grids / checkpoints in git.
#
# Usage: bank_evidence.sh "<commit message>" <path> [<path>...]
#
# Pathspec-scoped commit: only the named paths are committed, so a
# concurrently working interactive session's staged files are untouched.
# Retries on index.lock contention.
set -u
cd /root/repo
msg="$1"; shift

git add -f -- "$@"

# Nothing changed under these paths -> nothing to bank, not an error.
if [ -z "$(git status --porcelain -- "$@")" ]; then
  echo "bank_evidence: no changes under: $*"
  exit 0
fi

for i in 1 2 3 4 5; do
  if git commit -m "$msg" -- "$@"; then
    echo "bank_evidence: committed: $msg"
    exit 0
  fi
  sleep $((i * 5))
done
echo "bank_evidence: FAILED to commit: $msg" >&2
exit 1
