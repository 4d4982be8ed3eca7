# Shared helpers for the scheduler dispatchers (queue.pl / slurm.pl).
# Required (not executed); subs live in package main.
#
# The batch script materializes one `case` branch per array task with
# the JOB placeholder substituted in Perl — the same textual
# substitution run.pl performs — so quoting of the user's command never
# has to survive a runtime ${TASK_ID} expansion (single-quoted args,
# embedded quotes and command substitutions behave exactly as under
# run.pl, where the command runs through one bash -c).
use strict;
use warnings;
use Cwd qw(getcwd);

# does PATH carry an executable of this name?
sub jd_have_exe {
    my ($name) = @_;
    for my $dir (split /:/, ($ENV{PATH} || "")) {
        return 1 if $dir ne "" and -x "$dir/$name";
    }
    return 0;
}

# pop a leading JOB=1:N / JOB=N spec off the argv ref
sub jd_parse_jobspec {
    my ($argv) = @_;
    if (@$argv and $argv->[0] =~ m/^([A-Za-z_][A-Za-z0-9_]*)=(\d+):(\d+)$/) {
        shift @$argv;
        return ($1, $2, $3);
    }
    if (@$argv and $argv->[0] =~ m/^([A-Za-z_][A-Za-z0-9_]*)=(\d+)$/) {
        shift @$argv;
        return ($1, $2, $2);
    }
    return (undef, 1, 1);
}

sub jd_is_jobspec {
    my ($arg) = @_;
    return defined $arg
        && $arg =~ m/^[A-Za-z_][A-Za-z0-9_]*=\d+(:\d+)?$/;
}

# re-quote argv elements that contain whitespace so they survive the
# round-trip through the batch script (same rule as run.pl)
sub jd_quote_args {
    my @quoted;
    for my $arg (@_) {
        if ($arg =~ m/^\S+$/) {
            push @quoted, $arg;
        } elsif ($arg =~ m/"/) {
            push @quoted, "'" . $arg . "'";
        } else {
            push @quoted, '"' . $arg . '"';
        }
    }
    return join(" ", @quoted);
}

# batch-script path + a scheduler-safe job name from the log path
sub jd_script_and_name {
    my ($logfile) = @_;
    (my $qdir = $logfile) =~ s|/[^/]*$||;
    $qdir = "." if $qdir eq $logfile;
    $qdir .= "/q";
    system("mkdir", "-p", $qdir) == 0 or die "cannot mkdir $qdir\n";
    (my $base = $logfile) =~ s|.*/||;
    $base =~ s/\.[^.]+$//;
    my $script = "$qdir/$base.sh";
    # schedulers reject names with odd characters or leading digits
    (my $name = $base) =~ s/[^A-Za-z0-9_.-]/_/g;
    $name = "j$name" if $name =~ m/^[^A-Za-z]/ or $name eq "";
    return ($script, $name);
}

sub _sq {   # shell single-quoted literal
    my ($s) = @_;
    $s =~ s/'/'\\''/g;
    return "'" . $s . "'";
}

# write the batch script: one case branch per task, JOB substituted in
# Perl (run.pl semantics).  taskvar = scheduler task-id env variable.
sub jd_write_batch_script {
    my ($script, $taskvar, $logfile, $command, $jobname, $jstart,
        $jend) = @_;
    open(my $sh, ">", $script) or die "cannot write $script\n";
    print $sh "#!/bin/bash\n";
    print $sh "cd " . _sq(getcwd()) . "\n";
    print $sh "task=\"\${$taskvar:-$jstart}\"\n";
    print $sh "case \"\$task\" in\n";
    for my $job ($jstart .. $jend) {
        my $log = $logfile;
        my $cmd = $command;
        if (defined $jobname) {
            $log =~ s/\Q$jobname\E/$job/g;
            $cmd =~ s/\Q$jobname\E/$job/g;
        }
        print $sh "  $job)\n";
        print $sh "    log=" . _sq($log) . "\n";
        print $sh "    mkdir -p \"\$(dirname \"\$log\")\"\n";
        # header is a literal: the command must not re-parse here
        print $sh "    printf '%s\\n' " . _sq("# $cmd") . " > \"\$log\"\n";
        print $sh "    printf '# started %s\\n' \"\$(date)\" >> \"\$log\"\n";
        print $sh "    ( $cmd ) >> \"\$log\" 2>&1\n";
        print $sh "    ret=\$?\n";
        print $sh "    ;;\n";
    }
    print $sh "  *) echo \"unknown task id \$task\" >&2; exit 1;;\n";
    print $sh "esac\n";
    print $sh "printf '# finished %s status %s\\n' \"\$(date)\" " .
        "\"\$ret\" >> \"\$log\"\n";
    print $sh "exit \$ret\n";
    close $sh;
    chmod 0755, $script;
}

1;
