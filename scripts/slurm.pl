#!/usr/bin/env perl
# Slurm dispatcher with the Kaldi job-runner calling convention
# (fresh implementation; reference selects the dispatcher via $cmd,
# reference cmd.sh:12-15):
#
#   slurm.pl [options] [JOB=1:N] <logfile> <command...>
#
# Submits the command as a Slurm array job (sbatch --wait) with JOB
# substituted per task up front (run.pl semantics), logs per task, and
# returns nonzero if any task fails.  Recognized resource options
# (space or --opt=value form):
#
#   -p / -q / --partition <name>   partition
#   --mem <size>                   memory per task (e.g. 4G)
#   --num-threads / --num_threads <n>  cpus per task
#   --gpu <n>                      --gres=gpu:n
#   --time <limit>                 walltime
#   --max-jobs-run <n>             array concurrency cap (%n)
#   --config <file>                ignored (compatibility)
#   --exclusive / --requeue / --contiguous   forwarded to sbatch
#
# Without `sbatch` on PATH the job runs locally through run.pl with the
# same semantics (single-machine fallback).
use strict;
use warnings;
use FindBin;

require "$FindBin::Bin/job_dispatch_common.pl";

# options the dispatcher sets itself (dropped if user-supplied)
my %VALUELESS_DROP = ("-V" => 1, "--wait" => 1);
# recognized valueless sbatch flags, forwarded verbatim
my %VALUELESS_FWD = map { $_ => 1 }
    ("--exclusive", "--requeue", "--contiguous", "--overcommit");
my %res;
my @passthru;

sub apply_opt {
    my ($opt, $val) = @_;
    if ($opt eq "-p" or $opt eq "-q" or $opt eq "--partition") {
        $res{partition} = $val;
    } elsif ($opt eq "--mem" or $opt eq "--max-mem") {
        $res{mem} = $val;
    } elsif ($opt eq "--num-threads" or $opt eq "--num_threads") {
        $res{cpus} = $val;
    } elsif ($opt eq "--gpu") {
        $res{gpu} = $val;
    } elsif ($opt eq "--time") {
        $res{time} = $val;
    } elsif ($opt eq "--max-jobs-run") {
        $res{maxrun} = $val;
    } elsif ($opt eq "--config") {
        # site config files are a Kaldi-ism we do not replicate
    } else {
        return 0;
    }
    return 1;
}

my %TAKES_VALUE = map { $_ => 1 }
    ("-p", "-q", "--partition", "--mem", "--max-mem", "--num-threads",
     "--num_threads", "--gpu", "--time", "--max-jobs-run", "--config");

while (@ARGV and $ARGV[0] =~ m/^-/) {
    my $opt = shift @ARGV;
    if ($opt =~ m/^(--[A-Za-z][\w-]*)=(.*)$/s) {
        # --opt=value routes through the same mapping as the space form
        apply_opt($1, $2) or push @passthru, $opt;
        next;
    }
    next if exists $VALUELESS_DROP{$opt};
    if ($VALUELESS_FWD{$opt}) {
        push @passthru, $opt;
        next;
    }
    if ($TAKES_VALUE{$opt}) {
        my $val = @ARGV ? shift @ARGV : "";
        apply_opt($opt, $val);
        next;
    }
    # unknown flag: arity unknowable — consume a value only if it can't
    # be the JOB spec (an unknown VALUELESS flag directly before the
    # logfile will still misparse; add it to the tables above)
    my $val = (@ARGV and not main::jd_is_jobspec($ARGV[0]))
        ? shift @ARGV : "";
    push @passthru, $opt;
    push @passthru, $val if $val ne "";
}

my ($jobname, $jstart, $jend) = main::jd_parse_jobspec(\@ARGV);

die "slurm.pl: usage: slurm.pl [options] [JOB=1:N] <logfile> <command...>\n"
    unless @ARGV >= 2;

unless (main::jd_have_exe("sbatch")) {
    warn "slurm.pl: sbatch not found on PATH; running locally via run.pl\n";
    my @fwd = defined $jobname ? ("$jobname=$jstart:$jend") : ();
    exec("$FindBin::Bin/run.pl", @fwd, @ARGV)
        or die "slurm.pl: cannot exec run.pl\n";
}

my $logfile = shift @ARGV;
my $command = main::jd_quote_args(@ARGV);
my ($script, $name) = main::jd_script_and_name($logfile);
main::jd_write_batch_script($script, "SLURM_ARRAY_TASK_ID", $logfile,
                            $command, $jobname, $jstart, $jend);

my @sbatch = ("sbatch", "--wait", "--export=ALL", "--output=/dev/null",
              "--job-name=$name");
my $array = "$jstart-$jend";
$array .= "%$res{maxrun}" if $res{maxrun};
push @sbatch, "--array=$array" if defined $jobname or $jend > $jstart;
push @sbatch, "--partition=$res{partition}" if $res{partition};
push @sbatch, "--mem=$res{mem}"             if $res{mem};
push @sbatch, "--cpus-per-task=$res{cpus}"  if $res{cpus};
push @sbatch, "--gres=gpu:$res{gpu}"        if $res{gpu};
push @sbatch, "--time=$res{time}"           if $res{time};
push @sbatch, @passthru, $script;

my $ret = system(@sbatch);
if ($ret != 0) {
    print STDERR "slurm.pl: sbatch reported failed tasks; see $logfile\n";
    exit 1;
}
exit 0;
