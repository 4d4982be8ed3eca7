# Kaldi-convention command-line option parser (fresh implementation).
#
# Source this after declaring default variables; it consumes leading
# "--some-flag value" / "--some-flag=value" pairs, assigning to the
# variable some_flag (dashes become underscores).  A flag whose variable
# was never declared is an error.  Remaining positional args stay in "$@".

while true; do
  case "${1:-}" in
    --*)
      name="${1#--}"
      if [[ "$name" == *=* ]]; then
        value="${name#*=}"
        name="${name%%=*}"
        shift_count=1
      else
        value="$2"
        shift_count=2
        [ $# -lt 2 ] && echo "parse_options.sh: missing value for --$name" 1>&2 && exit 1
      fi
      varname="${name//-/_}"
      if ! declare -p "$varname" >/dev/null 2>&1; then
        echo "parse_options.sh: unknown option --$name" 1>&2
        exit 1
      fi
      printf -v "$varname" '%s' "$value"
      shift $shift_count
      ;;
    *) break ;;
  esac
done

true
