#!/usr/bin/env perl
# Sun/Univa Grid Engine dispatcher with the Kaldi job-runner calling
# convention (fresh implementation; reference selects the dispatcher via
# $cmd, reference cmd.sh:12-15):
#
#   queue.pl [options] [JOB=1:N] <logfile> <command...>
#
# Submits the command as an SGE array job (qsub -sync y) with JOB
# substituted per task up front (run.pl semantics), logs per task, and
# returns nonzero if any task fails.  Recognized resource options
# (space or --opt=value form):
#
#   -q <queue>                      queue name
#   --mem <size>                    -l mem_free=<size>,ram_free=<size>
#   --num-threads / --num_threads <n>   -pe smp <n>
#   --gpu <n>                       -l gpu=<n>
#   --max-jobs-run <n>              -tc <n> (array concurrency cap)
#   --config <file>                 ignored (compatibility)
#   -l / -P / -r / -pe ...          forwarded to qsub verbatim
#
# Without `qsub` on PATH the job runs locally through run.pl with the
# same semantics (single-machine fallback).
use strict;
use warnings;
use FindBin;

require "$FindBin::Bin/job_dispatch_common.pl";

# options the dispatcher sets itself (dropped if user-supplied)
my %VALUELESS_DROP = ("-V" => 1, "-cwd" => 1, "-sync" => 0);
# known value-taking options ALWAYS consume their value (so a value
# shaped name=digits, e.g. `-l gpu=1`, can never be mistaken for the
# JOB spec)
my %res;
my @passthru;

sub apply_opt {
    my ($opt, $val) = @_;
    if ($opt eq "-q" or $opt eq "--queue") {
        $res{queue} = $val;
    } elsif ($opt eq "--mem" or $opt eq "--max-mem") {
        $res{mem} = $val;
    } elsif ($opt eq "--num-threads" or $opt eq "--num_threads") {
        $res{cpus} = $val;
    } elsif ($opt eq "--gpu") {
        $res{gpu} = $val;
    } elsif ($opt eq "--max-jobs-run") {
        $res{maxrun} = $val;
    } elsif ($opt eq "--config") {
        # site config files are a Kaldi-ism we do not replicate
    } elsif ($opt eq "-l" or $opt eq "-P" or $opt eq "-r"
             or $opt eq "-p" or $opt eq "-o" or $opt eq "-e") {
        push @passthru, $opt, $val;    # SGE options, forwarded
    } else {
        return 0;
    }
    return 1;
}

my %TAKES_VALUE = map { $_ => 1 }
    ("-q", "--queue", "--mem", "--max-mem", "--num-threads",
     "--num_threads", "--gpu", "--max-jobs-run", "--config",
     "-l", "-P", "-r", "-p", "-o", "-e");

while (@ARGV and $ARGV[0] =~ m/^-/) {
    my $opt = shift @ARGV;
    if ($opt =~ m/^(--[A-Za-z][\w-]*)=(.*)$/s) {
        # --opt=value routes through the same mapping as the space form
        apply_opt($1, $2) or push @passthru, $opt;
        next;
    }
    next if exists $VALUELESS_DROP{$opt};
    if ($opt eq "-pe") {               # -pe takes TWO values
        my @vals = splice(@ARGV, 0, 2);
        push @passthru, "-pe", @vals;
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

die "queue.pl: usage: queue.pl [options] [JOB=1:N] <logfile> <command...>\n"
    unless @ARGV >= 2;

unless (main::jd_have_exe("qsub")) {
    warn "queue.pl: qsub not found on PATH; running locally via run.pl\n";
    my @fwd = defined $jobname ? ("$jobname=$jstart:$jend") : ();
    exec("$FindBin::Bin/run.pl", @fwd, @ARGV)
        or die "queue.pl: cannot exec run.pl\n";
}

my $logfile = shift @ARGV;
my $command = main::jd_quote_args(@ARGV);
my ($script, $name) = main::jd_script_and_name($logfile);
main::jd_write_batch_script($script, "SGE_TASK_ID", $logfile,
                            $command, $jobname, $jstart, $jend);

my @qsub = ("qsub", "-sync", "y", "-V", "-cwd", "-b", "n",
            "-o", "/dev/null", "-e", "/dev/null", "-N", $name);
if (defined $jobname or $jend > $jstart) {
    push @qsub, "-t", "$jstart-$jend";
    push @qsub, "-tc", $res{maxrun} if $res{maxrun};
}
push @qsub, "-q", $res{queue} if $res{queue};
push @qsub, "-l", "mem_free=$res{mem},ram_free=$res{mem}" if $res{mem};
push @qsub, "-pe", "smp", $res{cpus} if $res{cpus};
push @qsub, "-l", "gpu=$res{gpu}" if $res{gpu};
push @qsub, @passthru, $script;

my $ret = system(@qsub);
if ($ret != 0) {
    print STDERR "queue.pl: qsub reported failed tasks; see $logfile\n";
    exit 1;
}
exit 0;
